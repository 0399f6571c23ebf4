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


def _gather_tree(cache, idxs, per_layer: bool):
    return jax.tree_util.tree_map(
        lambda a: jnp.take(a, idxs, axis=_batch_axis(per_layer, a)), cache
    )


def _scatter_tree(cache, part, idxs, per_layer: bool):
    def put(a, p):
        ax = _batch_axis(per_layer, a)
        if ax == 0:
            return a.at[idxs].set(p)
        return a.at[:, idxs].set(p)

    return jax.tree_util.tree_map(put, cache, part)


@partial(jax.jit, static_argnames=("per_layer",))
def _gather_slots(cache, idxs, per_layer: bool):
    """Slice the cache rows of `idxs` out of the full cache — O(len(idxs))
    traffic, one dispatch for the whole pytree."""
    return _gather_tree(cache, idxs, per_layer)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("per_layer",))
def _scatter_slots(cache, part, idxs, per_layer: bool):
    """Write prefilled rows back into the full cache. The cache is DONATED,
    so the unique-index scatter updates the big buffers in place — the
    admission write-back is O(rows-written), independent of max_batch."""
    return _scatter_tree(cache, part, idxs, per_layer)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "qmeta", "n_steps", "do_decode", "dec_sampling", "per_layer",
        "arch",
    ),
    donate_argnums=(1,),
)
def _fused_step(
    params, cache, ids, starts, idxs, first_cols, ptemps,
    dec_tokens, dec_pos, dtemps, key, cfg, qmeta,
    n_steps: int, do_decode: bool, dec_sampling: bool, per_layer: bool,
    arch: str,
):
    """ONE device program for a whole engine step: admission-row gather →
    chunked prefill → scatter-back → first-token sampling → a decode
    block for the running slots. On a relay-attached TPU every dispatch
    costs a host round trip (measured 84 ms per 4-dispatch prefill phase
    vs ~20 ms of actual compute); fusing the step leaves exactly one
    dispatch and one (firsts, block-tokens) readback per engine step.

    Pad rows of the (bucketed) admission batch must carry DISTINCT slot
    indices not being prefilled (the caller picks them): they enter with
    start ≥ max_len so the masked writes change nothing and the scatter
    writes their own rows back unchanged — never racing a live slot's
    update (a duplicate-index scatter is last-write-wins-unspecified).
    """
    part = _gather_tree(cache, idxs, per_layer)
    logits, part = prefill_full(
        params, ids, part, cfg, qmeta, start=starts, arch=arch
    )
    cache = _scatter_tree(cache, part, idxs, per_layer)
    k1, k2 = jax.random.split(key)
    row_logits = jnp.take_along_axis(
        logits, first_cols[:, None, None], axis=1
    )[:, 0]
    firsts = mixed_sample(row_logits, ptemps, k1)
    if do_decode:
        toks, cache = decode_multi(
            params, dec_tokens, dec_pos, cache,
            dtemps if dec_sampling else None, k2, cfg, n_steps, qmeta,
            arch=arch,
        )
    else:
        toks = jnp.zeros((dec_tokens.shape[0], n_steps), jnp.int32)
    return firsts, toks, cache


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
        decode_block: int = 16,
        prefill_chunk: int = 256,
        prefill_parallel: int | None = None,
        kv_layout: str | None = None,
    ):
        # cold-start: persist compiled engine programs across processes
        # (the zoo is minutes of compile; see utils.compcache)
        from qtpu.utils.compcache import enable_compilation_cache

        enable_compilation_cache()
        self.params = params
        self.cfg = cfg
        self.arch = cfg.arch
        self.qmeta = qmeta
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len
        self.eos = eos_token
        self.decode_block = max(1, decode_block)
        self.prefill_chunk = max(16, prefill_chunk)
        # admit as wide as the slot table allows by default — measured on
        # v5e mixed load (r4): chunk 256 / parallel 8 gave 1,116 tok/s and
        # 0.57 s TTFT vs 935 / 0.70 at chunk 128 / parallel 4
        self.prefill_parallel = max(
            1, max_batch if prefill_parallel is None else prefill_parallel
        )
        # stacked caches measured FASTER at engine level on v5e (r4 A/B,
        # mixed load: 867 vs 554 tok/s, TTFT 0.76 vs 1.15 s) — the layer
        # scan amortizes launch overhead that the per-layer unrolled
        # forward pays 22×, outweighing the scan's cache-tile staging.
        # per_layer remains the long-context format (the S-blocked flash
        # kernel with in-place block writes needs standalone buffers);
        # engines with max_seq_len % 2048 == 0 and long contexts should
        # pass kv_layout="per_layer" explicitly.
        if kv_layout is None:
            kv_layout = "stacked"
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

    def warmup(self, include_sampling: bool = False) -> float:
        """Pre-build the engine's program zoo before serving traffic — the
        deploy-restart path. With the persistent compilation cache warm on
        disk (utils.compcache), every program here deserializes instead of
        compiling, so a restarted server reaches warm-TTFT service in the
        seconds this method takes rather than paying a deserialization (or
        worse, a compile) inside the first requests' TTFT.

        Runs each (admission-width × chunk-bucket × decode) engine-step
        program plus the drain-mode decode blocks once on a donated
        scratch cache; the live cache and RNG stream are untouched, so a
        warmed engine produces bit-identical outputs to a cold one.
        Returns wall seconds."""
        t0 = time.perf_counter()
        per_layer = self.cache.per_layer
        scratch = jax.tree_util.tree_map(jnp.zeros_like, self.cache)
        wkey = jax.random.PRNGKey(0x5EED)
        B = self.max_batch
        dec_tokens = jnp.zeros((B,), jnp.int32)
        dec_pos = jnp.zeros((B,), jnp.int32)
        dtemps = jnp.zeros((B,), jnp.float32)
        # drain-mode decode blocks (step() escalates to 32/64 when every
        # active slot has that many tokens left)
        blocks = sorted(
            {self.decode_block}
            | {b for b in (32, 64) if b > self.decode_block}
        )
        for blk in blocks:
            for temps in ((None, dtemps) if include_sampling else (None,)):
                toks, scratch = decode_multi(
                    self.params, dec_tokens, dec_pos, scratch, temps,
                    wkey, self.cfg, blk, self.qmeta, arch=self.arch,
                )
        # fused admission+decode steps over the bucketed shape grid. Tb
        # never exceeds a real prompt's length (< max_seq_len), so cap
        # the warm set — a wider program would be dead weight and can
        # even be uncompilable (chunk wider than the cache)
        chunk = self.prefill_chunk
        tb_cap = min(chunk, self.max_seq_len)
        tbs = sorted({
            min(_bucket(x), tb_cap)
            for x in (16, 32, 64, 128, 256, 512, chunk)
        })
        Ps = sorted({1, min(16, self.prefill_parallel, B)})
        for P in Ps:
            idxs = jnp.arange(P, dtype=jnp.int32)
            starts = jnp.zeros((P,), jnp.int32)
            first_cols = jnp.zeros((P,), jnp.int32)
            ptemps = jnp.zeros((P,), jnp.float32)
            for Tb in tbs:
                ids = jnp.zeros((P, Tb), jnp.int32)
                for do_decode in (False, True):
                    for samp in ((False, True) if include_sampling else (False,)):
                        firsts, toks, scratch = _fused_step(
                            self.params, scratch, ids, starts, idxs,
                            first_cols, ptemps, dec_tokens, dec_pos,
                            dtemps, wkey, self.cfg, self.qmeta,
                            self.decode_block, do_decode, samp,
                            per_layer, self.arch,
                        )
        # real host readback: on relay-attached TPUs block_until_ready
        # returns without fencing, so without this the warmup burst is
        # still draining when serving starts and the FIRST request's
        # readback absorbs it (measured: flat 3.3 s TTFT across wave 1)
        float(jnp.sum(firsts)) + float(jnp.sum(toks))
        del scratch
        return time.perf_counter() - t0

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

    def _prefill_chunk_arrays(self):
        """Build this step's bucketed admission arrays. Returns (ids [P,Tb],
        starts [P], idxs [P] slot per row, ns tokens consumed per live row,
        first_cols [P], ptemps [P]). Pad rows use DISTINCT non-prefilling
        slots (see _fused_step) and start = max_len (masked writes)."""
        pfs = self.prefilling
        P = _bucket(len(pfs)) if len(pfs) > 1 else 1
        P = min(P, max(1, self.prefill_parallel), self.max_batch)
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
        first_cols = np.zeros((P,), np.int32)
        ptemps = np.zeros((P,), np.float32)
        ns = []
        for r, pf in enumerate(pfs):
            n = min(len(pf.req.prompt) - pf.done, Tb)
            ids[r, :n] = pf.req.prompt[pf.done : pf.done + n]
            starts[r] = pf.done
            first_cols[r] = max(n - 1, 0)
            ptemps[r] = pf.req.temperature
            ns.append(n)
        live = {pf.slot for pf in pfs}
        spare = [i for i in range(self.max_batch) if i not in live]
        idxs = [pf.slot for pf in pfs] + spare[: P - len(pfs)]
        return ids, starts, np.asarray(idxs, np.int32), ns, first_cols, ptemps

    def _apply_prefill_results(self, ns, firsts):
        """Advance the in-flight admissions by this chunk; requests whose
        prompt completed take their sampled first token."""
        still = []
        now = time.perf_counter()
        for r, pf in enumerate(self.prefilling):
            pf.done += ns[r]
            if pf.done >= len(pf.req.prompt):
                pf.req.output.append(int(firsts[r]))
                pf.req.first_token_at = now
                self._finish_if_done(pf.slot, pf.req)
            else:
                still.append(pf)
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
        """One engine step: admissions + a decode block for running slots,
        all in ONE device program (or just the decode block when nothing
        is being admitted)."""
        self._start_prefill()
        mid_prefill = {pf.slot for pf in self.prefilling}
        active = [i for i in self.active if i not in mid_prefill]
        if not self.prefilling:
            if active:
                # drain mode: nothing waiting to be admitted → run a
                # bigger decode block (fewer relay round trips); bucketed
                # to bound the program zoo. Admissions pending → keep the
                # configured block so slots free / chunks interleave fast.
                block = self.decode_block
                if not self.queue:
                    # cap at the MINIMUM remaining across active slots: a
                    # slot one token from done must not ride out a 64-step
                    # block of masked writes and garbage appends
                    remaining = min(
                        self.slots[i].max_new_tokens
                        - len(self.slots[i].output)
                        for i in active
                    )
                    for cand in (64, 32):
                        if cand > block and remaining >= cand:
                            block = cand
                            break
                self._decode_block(active, block)
            return

        ids, starts, idxs, ns, first_cols, ptemps = (
            self._prefill_chunk_arrays()
        )
        dec_tokens, dec_pos, dtemps, sampling = self._decode_arrays(active)
        firsts, toks, self.cache = _fused_step(
            self.params, self.cache,
            jnp.asarray(ids), jnp.asarray(starts), jnp.asarray(idxs),
            jnp.asarray(first_cols), jnp.asarray(ptemps),
            jnp.asarray(dec_tokens), jnp.asarray(dec_pos),
            jnp.asarray(dtemps), self._next_key(),
            self.cfg, self.qmeta, self.decode_block,
            bool(active), sampling, self.cache.per_layer, self.arch,
        )
        firsts, toks_np = jax.device_get((firsts, toks))
        self._apply_prefill_results(ns, firsts)
        if active:
            self._apply_decode_results(active, toks_np)

    def _decode_arrays(self, active):
        S_cap = self.cache.max_len
        tokens = np.zeros((self.max_batch,), np.int32)
        pos = np.full((self.max_batch,), S_cap, np.int32)  # inactive: masked
        temps = np.zeros((self.max_batch,), np.float32)
        for i in active:
            req = self.slots[i]
            tokens[i] = req.output[-1]
            pos[i] = len(req.prompt) + len(req.output) - 1
            temps[i] = req.temperature
        return tokens, pos, temps, bool(np.any(temps > 0.0))

    def _apply_decode_results(self, active, toks_np, block=None):
        block = self.decode_block if block is None else block
        for i in active:
            req = self.slots[i]
            for j in range(block):
                req.output.append(int(toks_np[i, j]))
                if self._finish_if_done(i, req):
                    break

    def _decode_block(self, active, block=None):
        """Pure-decode step (no admissions pending): one decode_multi
        block, one dispatch."""
        block = self.decode_block if block is None else block
        tokens, pos, temps, sampling = self._decode_arrays(active)
        toks, self.cache = decode_multi(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(pos),
            self.cache,
            jnp.asarray(temps) if sampling else None,
            self._next_key(),
            self.cfg,
            block,
            self.qmeta,
            arch=self.arch,
        )
        self._apply_decode_results(active, np.asarray(toks), block)

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
