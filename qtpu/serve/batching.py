"""Continuous batching engine (new subsystem; the reference has no serving
at all — SURVEY §0).

vLLM-style slot scheduler, TPU-shaped: a FIXED max_batch of sequence slots
so every jitted program has static shapes. Sequences join mid-flight (their
prompt is prefilled into a free slot while other slots keep decoding), emit
one token per engine step, and free their slot on EOS/max-tokens. Host-side
Python does only bookkeeping; sampling runs on device (per-slot
temperature) so only sampled token ids cross the host link. Prefill, the
batched decode step, and batched sampling are the jitted programs.

Prompt lengths are padded to pow-2 buckets to bound compiled-shape count.
Padding is safe without masked writes: the pad positions' garbage K/V at
[T, Tb) are overwritten by the decode-step writes at those positions before
any query ever attends that far (a decode at position p attends keys ≤ p,
and every position in [T, p] was rewritten by an earlier or the current
decode step).

Invariants per active slot i with request r:
  r.output      — tokens emitted so far (first one sampled from prefill
                  logits at the last real prompt position)
  input token   = r.output[-1], at position prompt_len + len(output) − 1
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.serve.decode import decode_step, prefill_full
from qtpu.serve.kvcache import init_cache


@dataclass
class Request:
    uid: int
    prompt: np.ndarray  # [T] int32
    max_new_tokens: int = 64
    temperature: float = 0.0
    output: list = field(default_factory=list)
    done: bool = False
    # serving metrics (wall-clock seconds)
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0

    @property
    def ttft(self) -> float:
        """Time to first token."""
        return self.first_token_at - self.submitted_at

    @property
    def tokens_per_second(self) -> float:
        dt = self.finished_at - self.first_token_at
        return (len(self.output) - 1) / dt if dt > 0 else float("inf")


def _bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b


@jax.jit
def _sample_batch(logits, temps, key):
    """Device-side per-slot sampling: greedy where temps ≤ 0, else
    categorical at that slot's temperature. Returns [B] int32.

    Sampling on device matters on relay-attached TPUs: shipping the full
    [B, vocab] logits to the host costs ~1 MB per engine step (≈77 ms at
    the measured 13 MB/s host link) vs 4 bytes/slot for sampled ids."""
    greedy = jnp.argmax(logits, axis=-1)
    z = logits / jnp.maximum(temps, 1e-6)[:, None]
    samp = jax.random.categorical(key, z, axis=-1)
    return jnp.where(temps > 0.0, samp, greedy).astype(jnp.int32)


class ContinuousBatcher:
    def __init__(
        self,
        params,
        cfg,
        qmeta=None,
        max_batch: int = 8,
        max_seq_len: int = 1024,
        kv_dtype: str = "bfloat16",
        eos_token: int | None = None,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.arch = cfg.arch
        self.qmeta = qmeta
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.eos = eos_token
        self.cache = init_cache(
            cfg, max_batch, max_seq_len, quantized=(kv_dtype == "int8")
        )
        self.slots: list[Request | None] = [None] * max_batch
        self.queue: list[Request] = []
        self.finished: list[Request] = []
        self.key = jax.random.PRNGKey(seed)
        self._uid = 0

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ----------------------------------------------------------- client API
    def submit(self, prompt_ids, max_new_tokens: int = 64, temperature: float = 0.0):
        req = Request(
            uid=self._uid,
            prompt=np.asarray(prompt_ids, np.int32).reshape(-1),
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            submitted_at=time.perf_counter(),
        )
        self._uid += 1
        self.queue.append(req)
        return req

    def run(self, max_steps: int = 100_000):
        """Drive until queue and slots drain. Returns finished requests."""
        steps = 0
        while (self.queue or any(s is not None for s in self.slots)) and (
            steps < max_steps
        ):
            self.step()
            steps += 1
        return self.finished

    @property
    def active(self) -> list[int]:
        return [i for i in range(self.max_batch) if self.slots[i] is not None]

    # ------------------------------------------------------------ internals
    def _slot_cache(self, i):
        return jax.tree_util.tree_map(
            lambda a: a[:, i : i + 1] if a.ndim >= 2 else a[i : i + 1],
            self.cache,
        )

    def _write_slot_cache(self, i, slot_cache):
        self.cache = jax.tree_util.tree_map(
            lambda full, part: (
                full.at[:, i : i + 1].set(part)
                if full.ndim >= 2
                else full.at[i : i + 1].set(part)
            ),
            self.cache,
            slot_cache,
        )

    def _admit(self):
        for i in range(self.max_batch):
            if self.slots[i] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            T = len(req.prompt)
            if T == 0 or T + req.max_new_tokens > self.max_seq_len:
                req.done = True
                req.finished_at = time.perf_counter()
                self.finished.append(req)
                continue
            Tb = min(_bucket(T), self.max_seq_len)
            ids = np.zeros((1, Tb), np.int32)
            ids[0, :T] = req.prompt
            slot_cache = self._slot_cache(i)
            logits, slot_cache = prefill_full(
                self.params,
                jnp.asarray(ids),
                slot_cache,
                self.cfg,
                self.qmeta,
                arch=self.arch,
            )
            self._write_slot_cache(i, slot_cache)
            first = int(
                _sample_batch(
                    logits[:, T - 1],
                    jnp.full((1,), req.temperature, jnp.float32),
                    self._next_key(),
                )[0]
            )
            req.output.append(first)
            req.first_token_at = time.perf_counter()
            self.slots[i] = req

    def step(self):
        """One engine step: admit new requests, then one batched decode."""
        self._admit()
        active = self.active
        if not active:
            return
        tokens = np.zeros((self.max_batch,), np.int32)
        pos = np.zeros((self.max_batch,), np.int32)
        temps = np.zeros((self.max_batch,), np.float32)
        for i in active:
            req = self.slots[i]
            tokens[i] = req.output[-1]
            pos[i] = len(req.prompt) + len(req.output) - 1
            temps[i] = req.temperature
        logits, self.cache = decode_step(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(pos),
            self.cache,
            self.cfg,
            self.qmeta,
            arch=self.arch,
        )
        toks_np = np.asarray(
            _sample_batch(logits, jnp.asarray(temps), self._next_key())
        )
        for i in active:
            req = self.slots[i]
            tok = int(toks_np[i])
            req.output.append(tok)
            hit_eos = self.eos is not None and tok == self.eos
            total = len(req.prompt) + len(req.output)
            if (
                hit_eos
                or len(req.output) >= req.max_new_tokens
                or total >= self.max_seq_len
            ):
                req.done = True
                req.finished_at = time.perf_counter()
                self.finished.append(req)
                self.slots[i] = None


    def metrics(self) -> dict:
        """Aggregate serving metrics over finished requests."""
        done = [r for r in self.finished if r.output]
        if not done:
            return {"requests": 0}
        return {
            "requests": len(done),
            "total_tokens": sum(len(r.output) for r in done),
            "mean_ttft_s": float(np.mean([r.ttft for r in done])),
            "mean_tokens_per_second": float(
                np.mean([r.tokens_per_second for r in done if len(r.output) > 1])
            ),
        }
