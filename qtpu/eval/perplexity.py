"""Perplexity evaluation (reference C14) — exact reference math.

Reproduces quantization_utils.py:269-322 idiosyncrasies precisely
(SURVEY §7.4 "exact ppl parity"):
  - the token stream is sliced into non-overlapping `block_size` blocks
  - logits are cast to fp32 BEFORE the shifted cross-entropy (:309)
  - per-block nll = mean-token-loss × block_size (:318) — i.e. the final
    (block_size−1) mean is rescaled by block_size, exactly as the reference
  - ppl = exp(Σ nll / (n_samples · block_size)) (:321)

The per-block forwards are independent, so under a mesh the blocks shard
over the `data` axis (embarrassingly parallel, identical math).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cfg", "qmeta", "arch"))
def _block_nll(params, batch, cfg, qmeta=None, arch="llama"):
    """Mean shifted cross-entropy of one [1, B] block (fp32), reference
    style: loss over B−1 positions."""
    from qtpu.models import get_arch

    forward = get_arch(arch).forward
    logits = forward(params, batch, cfg, qmeta=qmeta)  # fp32 [1, B, V]
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = batch[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll_tok = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)
    return jnp.mean(nll_tok)


def evaluate_perplexity(
    params,
    test_ids: jnp.ndarray,
    cfg,
    n_samples: int = 40,
    block_size: int = 2048,
    qmeta=None,
    arch: str = "llama",
    mesh=None,
    verbose: bool = False,
) -> float:
    """test_ids: [1, N] token stream. Returns scalar perplexity.

    With a mesh, the independent eval blocks shard over the `data` axis
    (SURVEY §5.7: embarrassingly parallel, exactly reproduces the serial
    math since blocks are non-overlapping). Params should already carry
    their shardings if tensor parallelism is wanted too.
    """
    n_avail = test_ids.shape[1] // block_size
    n = min(n_samples, n_avail)
    if mesh is not None and "pipe" in mesh.axis_names and mesh.shape["pipe"] > 1:
        return _evaluate_pipelined(
            params, test_ids, cfg, n, block_size, qmeta, arch, mesh
        )
    if mesh is not None:
        return _evaluate_sharded(
            params, test_ids, cfg, n, block_size, qmeta, arch, mesh
        )
    nlls = []
    for i in range(n):
        batch = test_ids[:, i * block_size : (i + 1) * block_size]
        loss = _block_nll(params, batch, cfg, qmeta, arch)
        nlls.append(loss * block_size)
        if verbose and (i + 1) % 8 == 0:
            print(f"  eval block {i + 1}/{n}")
    total = jnp.sum(jnp.stack(nlls))
    ppl = jnp.exp(total / (len(nlls) * block_size))
    return float(ppl)


def _evaluate_pipelined(params, test_ids, cfg, n, block_size, qmeta, arch, mesh):
    """Pipeline-parallel eval: each non-overlapping block is one microbatch
    of the GPipe schedule (qtpu.sharding.pipeline.pipeline_nll), layers
    sharded over the mesh's `pipe` axis. Exactly the reference per-block
    math — pipeline_nll returns mean-CE × block_size per microbatch."""
    import numpy as np

    from qtpu.sharding.pipeline import pipeline_nll, shard_params_pipeline

    # (re-)place params for the pipe mesh: quantized/packed pytrees built
    # after _setup_mesh may have lost the stage sharding
    params = shard_params_pipeline(params, mesh)
    ids = np.asarray(test_ids)[0, : n * block_size].reshape(n, 1, block_size)
    n_stages = int(mesh.shape["pipe"])
    nll = pipeline_nll(
        params,
        jnp.asarray(ids),
        cfg,
        mesh,
        n_stages,
        qmeta=qmeta,
        arch=arch,
    )
    return float(jnp.exp(jnp.sum(nll) / (n * block_size)))


def _evaluate_sharded(params, test_ids, cfg, n, block_size, qmeta, arch, mesh):
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qtpu.models import get_arch

    forward = get_arch(arch).forward
    dp = mesh.shape["data"]
    ids = np.asarray(test_ids)[0, : n * block_size].reshape(n, block_size)
    pad = (-n) % dp
    if pad:  # pad rows contribute zero via masking
        ids = np.concatenate([ids, np.zeros((pad, block_size), ids.dtype)])
    valid = np.arange(ids.shape[0]) < n

    @partial(jax.jit, static_argnames=())
    def all_blocks(params, blocks, valid):
        logits = forward(params, blocks, cfg, qmeta=qmeta)
        shift_logits = logits[:, :-1, :].astype(jnp.float32)
        shift_labels = blocks[:, 1:]
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll_tok = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)
        per_block = jnp.mean(nll_tok[..., 0], axis=-1) * block_size
        return jnp.sum(jnp.where(valid, per_block, 0.0))

    with jax.sharding.set_mesh(mesh):
        blocks = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P("data", None))
        )
        v = jax.device_put(
            jnp.asarray(valid), NamedSharding(mesh, P("data"))
        )
        total = all_blocks(params, blocks, v)
    return float(jnp.exp(total / (n * block_size)))
