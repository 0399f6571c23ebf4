"""Prefill + decode steps and sampling (the serving loop the reference
lacks; its eval harness only does teacher-forced perplexity,
quantization_utils.py:269-322).

Both steps run through models.llama.forward_with_cache with packed-weight
qmeta, so serving exercises the fused dequant-matmul path. The decode loop
for fixed-length generation is a jitted lax.scan (one compiled program for
the whole generation); the continuous-batching engine calls single
decode_step instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

def _fwc(arch):
    from qtpu.models import get_arch

    return get_arch(arch).forward_with_cache


def prefill(params, ids, cache, cfg, qmeta=None, start=None, arch="llama"):
    """Process a [B, T] prompt; returns (last-position logits [B, V],
    cache). start: [B] per-sequence offsets (default zeros)."""
    B, T = ids.shape
    if start is None:
        start = jnp.zeros((B,), jnp.int32)
    positions = start[:, None] + jnp.arange(T)[None, :]
    logits, cache = _fwc(arch)(params, ids, positions, cache, cfg, qmeta)
    return logits[:, -1, :], cache


def prefill_full(params, ids, cache, cfg, qmeta=None, start=None, arch="llama"):
    """Like prefill but returns logits at EVERY position [B, T, V] — the
    continuous batcher samples at the last REAL (pre-padding) position."""
    B, T = ids.shape
    if start is None:
        start = jnp.zeros((B,), jnp.int32)
    positions = start[:, None] + jnp.arange(T)[None, :]
    return _fwc(arch)(params, ids, positions, cache, cfg, qmeta)


def decode_step(params, token, pos, cache, cfg, qmeta=None, arch="llama"):
    """One token per sequence: token [B], pos [B] absolute position.
    Returns (logits [B, V], cache)."""
    logits, cache = _fwc(arch)(
        params, token[:, None], pos[:, None], cache, cfg, qmeta
    )
    return logits[:, 0, :], cache


def sample_token(logits, key, temperature=0.0, top_k=0, top_p=0.0):
    """Greedy (temperature 0) / temperature / top-k / top-p sampling."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p and 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("cfg", "qmeta", "n_steps", "arch"),
    donate_argnums=(3,),
)
def decode_multi(
    params,
    token,
    pos,
    cache,
    temps,
    key,
    cfg,
    n_steps: int,
    qmeta=None,
    arch: str = "llama",
):
    """n_steps decode steps as ONE compiled program (lax.scan), the unit
    the continuous batcher and bench drive. Amortizes per-dispatch host
    overhead (measured ~0.76 ms/step of the 3.5 ms per-step path on a
    relay-attached v5e — the single largest decode cost) and lets XLA keep
    the KV cache in place via donation.

    token/pos [B] (pos = the absolute position of `token`); temps [B] f32
    per-slot sampling temperatures (≤0 = greedy), or None for all-greedy —
    None is STATIC and skips the categorical-sampling program entirely
    (gumbel noise over [B, vocab] logits every step costs real VPU time;
    the batcher passes None whenever no active slot samples). Inactive
    batch slots should pass pos ≥ cache.max_len so their cache writes mask
    away (qtpu.serve.kvcache.cache_layer_write T=1 path).

    Returns (tokens [B, n_steps], cache) — tokens[:, i] is the token
    sampled after step i; the caller trims per-slot output at EOS /
    max_new_tokens (overshoot steps write only past-EOS positions, which
    the next prefill into the slot overwrites before anything attends to
    them — same invariant as prompt-pad writes, see serve.batching).
    """

    def step(carry, k):
        tok, p, cache = carry
        logits, cache = decode_step(params, tok, p, cache, cfg, qmeta, arch=arch)
        nxt = mixed_sample(logits, temps, k)
        return (nxt, p + 1, cache), nxt

    keys = jax.random.split(key, n_steps)
    (tok, p, cache), toks = jax.lax.scan(step, (token, pos, cache), keys)
    return jnp.moveaxis(toks, 0, 1), cache


def mixed_sample(logits, temps, key):
    """Per-row sampling at per-row temperature: greedy where temps ≤ 0,
    categorical at temps[i] otherwise; temps=None (static) = all greedy.
    logits [B, V], temps [B] | None → [B]."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temps is None:
        return greedy
    z = logits / jnp.maximum(temps, 1e-6)[:, None]
    samp = jax.random.categorical(key, z, axis=-1)
    return jnp.where(temps > 0.0, samp, greedy).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("cfg", "qmeta", "n_tokens", "temperature", "top_k", "top_p", "arch"),
)
def greedy_generate(
    params,
    prompt_ids,
    cache,
    cfg,
    n_tokens: int,
    qmeta=None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    key=None,
    arch: str = "llama",
):
    """Prefill a [B, T] prompt then generate n_tokens with a jitted scan.
    Returns (tokens [B, n_tokens], cache)."""
    B, T = prompt_ids.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    logits, cache = prefill(params, prompt_ids, cache, cfg, qmeta, arch=arch)
    tok0 = sample_token(logits, key, temperature, top_k, top_p)

    def step(carry, k):
        tok, pos, cache = carry
        logits, cache = decode_step(params, tok, pos, cache, cfg, qmeta, arch=arch)
        nxt = sample_token(logits, k, temperature, top_k, top_p)
        return (nxt, pos + 1, cache), tok

    pos0 = jnp.full((B,), T, jnp.int32)
    keys = jax.random.split(key, n_tokens)
    (last, _, cache), toks = jax.lax.scan(step, (tok0, pos0, cache), keys)
    toks = jnp.moveaxis(toks, 0, 1)  # [B, n_tokens]
    return toks, cache
