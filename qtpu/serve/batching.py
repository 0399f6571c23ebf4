"""Continuous batching engine (new subsystem; the reference has no serving
at all — SURVEY §0).

vLLM-style slot scheduler, TPU-shaped: a FIXED max_batch of sequence slots
so every jitted program has static shapes. Sequences join mid-flight (their
prompt is prefilled into a free slot while other slots keep decoding), emit
tokens in blocks, and free their slot on EOS/max-tokens. Host-side Python
does only bookkeeping; sampling runs on device (per-slot temperature) so
only sampled token ids cross the host link.

Three scheduler-level latencies are engineered away:
  * Decode runs in BLOCKS of `decode_block` steps through one compiled
    lax.scan program (qtpu.serve.decode.decode_multi) — per-step Python
    dispatch measured ~0.76 ms on a relay-attached v5e, more than a third
    of the whole step.
  * Prefill is CHUNKED: long prompts are fed `prefill_chunk` tokens at a
    time, with a decode block for the already-running slots between
    chunks, so admission no longer stalls decode for the whole prompt.
    Middle chunks are exactly full (pad garbage inside the live range
    would be attended by later chunks); only the final chunk is padded to
    a pow-2 bucket, whose pad positions sit beyond the prompt and are
    overwritten by decode writes before any query attends that far.
  * Admission is BATCHED and O(slots-admitted): up to `prefill_parallel`
    requests prefill together in one program, and their cache rows move
    through jitted gather/scatter helpers (donated, so XLA updates the
    big cache buffers in place) instead of per-leaf host-driven
    full-cache `.at[].set` copies — admission cost no longer scales with
    max_batch.

Invariants per active slot i with request r:
  r.output      — tokens emitted so far (first one sampled from prefill
                  logits at the last real prompt position)
  input token   = r.output[-1], at position prompt_len + len(output) − 1
Inactive slots enter decode blocks with pos = cache.max_len, which the
T=1 cache write masks away; rows of a batched prefill that are shorter
than the chunk batch enter with start = max_len, which the (now masked)
T>1 write skips the same way (no writes, garbage logits ignored).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

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


def _batch_axis(per_layer: bool, a) -> int:
    # per-layer cache leaves are [B, ...]; stacked leaves are [L, B, ...]
    # except `length` [B]
    if per_layer or a.ndim < 2:
        return 0
    return 1


@partial(jax.jit, static_argnames=("per_layer",))
def _gather_slots(cache, idxs, per_layer: bool):
    """Slice the cache rows of `idxs` out of the full cache — O(len(idxs))
    traffic, one dispatch for the whole pytree."""
    return jax.tree_util.tree_map(
        lambda a: jnp.take(a, idxs, axis=_batch_axis(per_layer, a)), cache
    )


@partial(jax.jit, donate_argnums=(0,), static_argnames=("per_layer",))
def _scatter_slots(cache, part, idxs, per_layer: bool):
    """Write prefilled rows back into the full cache. The cache is DONATED,
    so the unique-index scatter updates the big buffers in place — the
    admission write-back is O(rows-written), independent of max_batch."""
    def put(a, p):
        ax = _batch_axis(per_layer, a)
        if ax == 0:
            return a.at[idxs].set(p)
        return a.at[:, idxs].set(p)

    return jax.tree_util.tree_map(put, cache, part)


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
        prefill_parallel: int = 4,
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
        self.prefill_parallel = max(1, prefill_parallel)
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
        self.prefilling: list[_Prefill] = []
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
            or self.prefilling
            or any(s is not None for s in self.slots)
        ) and steps < max_steps:
            self.step()
            steps += 1
        return self.finished

    @property
    def active(self) -> list[int]:
        return [i for i in range(self.max_batch) if self.slots[i] is not None]

    # ------------------------------------------------------------ internals
    def _start_prefill(self):
        """Admit queued requests into free slots, up to prefill_parallel
        in-flight prefills."""
        while self.queue and len(self.prefilling) < self.prefill_parallel:
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
            self.prefilling.append(_Prefill(req=req, slot=free, done=0))

    def _prefill_chunk(self):
        """Run ONE chunk of ALL in-flight admissions as one batched prefill
        program; requests reaching their final chunk sample their first
        token. Pad rows (batch bucketing) and rows shorter than the chunk
        batch enter with start = max_len, which the masked T>1 cache write
        skips entirely."""
        pfs = self.prefilling
        P = _bucket(len(pfs)) if len(pfs) > 1 else 1
        P = min(P, max(1, self.prefill_parallel))
        chunk = self.prefill_chunk
        # chunk length: full chunks while any request has a full chunk
        # left; once all are on their final partial chunk, shrink to the
        # bucketed max remainder (fewer wasted pad tokens per program)
        rems = [len(pf.req.prompt) - pf.done for pf in pfs]
        if all(r <= chunk for r in rems):
            Tb = min(_bucket(max(rems)), chunk)
        else:
            Tb = chunk
        S_cap = self.cache.max_len
        ids = np.zeros((P, Tb), np.int32)
        starts = np.full((P,), S_cap, np.int32)  # pad rows: masked
        ns = []
        for r, pf in enumerate(pfs):
            n = min(len(pf.req.prompt) - pf.done, Tb)
            ids[r, :n] = pf.req.prompt[pf.done : pf.done + n]
            starts[r] = pf.done
            ns.append(n)
        idxs = jnp.asarray(
            [pf.slot for pf in pfs] + [0] * (P - len(pfs)), jnp.int32
        )
        part = _gather_slots(self.cache, idxs, self.cache.per_layer)
        logits, part = prefill_full(
            self.params,
            jnp.asarray(ids),
            part,
            self.cfg,
            self.qmeta,
            start=jnp.asarray(starts),
            arch=self.arch,
        )
        # scatter back only the LIVE rows: pad rows alias slot 0 and a
        # duplicate-index scatter is last-write-wins-unspecified — a pad
        # row's stale pre-prefill copy of slot 0 must never race a real
        # write into slot 0
        if len(pfs) < P:
            part = jax.tree_util.tree_map(
                lambda a: (
                    a[: len(pfs)]
                    if _batch_axis(self.cache.per_layer, a) == 0
                    else a[:, : len(pfs)]
                ),
                part,
            )
        self.cache = _scatter_slots(
            self.cache, part, idxs[: len(pfs)], self.cache.per_layer
        )
        still = []
        finishing = []
        for r, pf in enumerate(pfs):
            pf.done += ns[r]
            if pf.done >= len(pf.req.prompt):
                finishing.append((r, ns[r] - 1, pf))
            else:
                still.append(pf)
        if finishing:
            rows = jnp.asarray([r for r, _, _ in finishing], jnp.int32)
            cols = jnp.asarray([c for _, c, _ in finishing], jnp.int32)
            temps = jnp.asarray(
                [pf.req.temperature for _, _, pf in finishing], jnp.float32
            )
            firsts = np.asarray(
                _sample_batch(logits[rows, cols], temps, self._next_key())
            )
            now = time.perf_counter()
            for (r, _, pf), tok in zip(finishing, firsts):
                pf.req.output.append(int(tok))
                pf.req.first_token_at = now
                self._finish_if_done(pf.slot, pf.req)
        self.prefilling = still

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
        """One engine step: one batched prefill chunk (if admissions are
        pending) then one decode block for the active slots."""
        self._start_prefill()
        if self.prefilling:
            self._prefill_chunk()

        mid_prefill = {pf.slot for pf in self.prefilling}
        active = [i for i in self.active if i not in mid_prefill]
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
