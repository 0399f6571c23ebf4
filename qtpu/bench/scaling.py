"""Scaling-efficiency benchmark (BASELINE.json target: ≥85% at N hosts).

Measures decode tokens/s on meshes of growing size built from the same
device pool and reports efficiency vs linear scaling of the single-device
run. On a real pod slice the mesh axes map onto ICI and this yields the
true scaling curve; on the CPU backend it exercises the full sharded path
functionally (the numbers are not meaningful there, but the harness and
shardings are identical).

Data parallelism scales the serving batch (each data shard holds its own
sequences); tensor parallelism shards weights + KV heads.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from qtpu.serve import init_cache
from qtpu.serve.decode import decode_step, prefill
from qtpu.sharding import make_mesh, shard_params


def decode_tokens_per_s(
    params,
    cfg,
    qmeta=None,
    mesh=None,
    batch_per_data_shard: int = 8,
    prompt_len: int = 64,
    n_steps: int = 32,
    arch: str = "llama",
) -> float:
    """Tokens/s of the batched decode loop, optionally over a mesh."""
    dp = mesh.shape["data"] if mesh is not None else 1
    B = batch_per_data_shard * dp
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (B, prompt_len)),
        jnp.int32,
    )
    if mesh is not None:
        params = shard_params(params, mesh)
        prompt = jax.device_put(prompt, NamedSharding(mesh, P("data", None)))

    import contextlib

    ctx = jax.sharding.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with ctx:
        def run(n):
            cache = init_cache(cfg, B, prompt_len + n_steps + 8, quantized=True)
            if mesh is not None:
                cache = jax.tree_util.tree_map(
                    lambda a: jax.device_put(
                        a,
                        NamedSharding(mesh, P(None, "data") if a.ndim > 1 else P("data")),
                    ),
                    cache,
                )
            t0 = time.perf_counter()
            logits, cache = prefill(params, prompt, cache, cfg, qmeta, arch=arch)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            pos = jnp.full((B,), prompt_len, jnp.int32)
            for _ in range(n):
                logits, cache = decode_step(
                    params, tok, pos, cache, cfg, qmeta, arch=arch
                )
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                pos = pos + 1
            float(jnp.sum(tok))
            return time.perf_counter() - t0

        run(2)
        per_tok = max((run(n_steps + 2) - run(2)) / n_steps, 1e-9)
    return B / per_tok


def scaling_sweep(
    params,
    cfg,
    qmeta=None,
    mesh_shapes=((1, 1), (2, 1), (4, 1)),
    repeats: int = 1,
    **kw,
) -> list[dict]:
    """Measure tokens/s across mesh shapes; efficiency = tps / (tps_1 × N).

    repeats > 1 measures each shape that many times and reports the best
    (with all trials recorded) — on the virtual CPU mesh the dp > 1 shapes
    oversubscribe host threads, so single trials are noisy."""
    results = []
    base = None
    for dp, tp in mesh_shapes:
        n = dp * tp
        mesh = make_mesh(data=dp, model=tp) if n > 1 else None
        trials = [
            decode_tokens_per_s(params, cfg, qmeta, mesh, **kw)
            for _ in range(max(1, repeats))
        ]
        tps = max(trials)
        if base is None:
            base = tps
        row = {
            "mesh": {"data": dp, "model": tp},
            "devices": n,
            "tokens_per_second": tps,
            "scaling_efficiency": tps / (base * n),
        }
        if repeats > 1:
            row["trials_tokens_per_second"] = trials
        results.append(row)
    return results
