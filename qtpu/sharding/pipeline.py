"""Pipeline parallelism: GPipe-style microbatch pipeline over a `pipe`
mesh axis (SURVEY §2.3 P3 — absent from the reference, which is strictly
single-device; this is the TPU-native form: layers sharded over stages,
activations moved stage-to-stage with `ppermute` over ICI inside a
`shard_map`, no sends/recvs or NCCL).

Design:
  * The stacked layer pytree [L, ...] shards its LAYER axis over `pipe` —
    stage s holds layers [s·L/P, (s+1)·L/P). No per-layer scatter: the
    stacking the models already use IS the pipeline partition.
  * SPMD schedule: at tick t ∈ [0, M + P − 1), every stage shifts its
    activation to the next stage (one ppermute), stage 0 injects
    microbatch t (embedding computed locally, masked elsewhere), every
    stage applies its local layers, and the LAST stage evaluates the
    head + per-microbatch loss — a scalar per microbatch, so nothing
    large ever leaves the last stage.
  * Embedding/head/final-norm params are replicated (every stage computes
    them; only the stage that needs the result keeps it — the standard
    SPMD-pipeline trade of a little redundant FLOP for zero control flow).

The public entry is pipeline_nll: teacher-forced shifted-CE NLL over
microbatches (the reference's perplexity math, quantization_utils.py:
269-322, fp32 CE × block_size), pipelined. Used by eval.perplexity when
the mesh has a pipe axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qtpu.models import get_arch


def make_pipe_mesh(pipe: int, data: int = 1, model: int = 1, devices=None) -> Mesh:
    """('data', 'pipe'[, 'model']) mesh: batch-of-microbatch streams ×
    stages × (optional) Megatron tensor-parallel shards within each stage.
    `model` is the innermost axis so TP collectives ride the
    fastest-adjacent ICI links."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = data * pipe * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{pipe}x{model} needs {n} devices, "
            f"have {len(devices)}"
        )
    if model > 1:
        arr = np.asarray(devices[:n]).reshape(data, pipe, model)
        return Mesh(arr, ("data", "pipe", "model"))
    arr = np.asarray(devices[:n]).reshape(data, pipe)
    return Mesh(arr, ("data", "pipe"))


def shard_params_pipeline(params: dict, mesh: Mesh, arch: str = "llama") -> dict:
    """Place params for pipeline parallelism: every [L, ...] layer leaf
    shards axis 0 over `pipe`; embed/head/final norms replicate. On a
    3-axis ('data','pipe','model') mesh each leaf ADDITIONALLY carries its
    Megatron TP sharding (qtpu.sharding.specs.param_specs) on the
    non-layer dims — stage-local matmuls then shard over `model` via
    GSPMD while the schedule moves activations over `pipe`."""
    has_tp = "model" in mesh.axis_names
    if has_tp:
        from qtpu.sharding.specs import param_specs

        tp_specs = param_specs(params, arch=arch)

        def overlay(spec, is_layer):
            # replace the leading (layer-axis) None with 'pipe'
            if not is_layer:
                return spec
            return P("pipe", *tuple(spec)[1:])

    out = {}
    for name, val in params.items():
        is_layer = name == "layers"
        if has_tp:
            specs = (
                jax.tree_util.tree_map(
                    lambda s: overlay(s, is_layer),
                    tp_specs[name],
                    is_leaf=lambda s: isinstance(s, P),
                )
                if name in tp_specs
                else jax.tree_util.tree_map(
                    lambda a: P(*((None,) * a.ndim)), val
                )
            )
            out[name] = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                val,
                specs,
            )
            continue
        spec_of = (
            (lambda a: P("pipe", *((None,) * (a.ndim - 1))))
            if is_layer
            else (lambda a: P(*((None,) * a.ndim)))
        )
        out[name] = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, spec_of(a))),
            val,
        )
    return out


@partial(
    jax.jit, static_argnames=("cfg", "qmeta", "arch", "n_stages", "mesh")
)
def pipeline_nll(params, batches, cfg, mesh, n_stages: int, qmeta=None,
                 arch: str = "llama"):
    """Pipelined teacher-forced NLL per microbatch.

    batches: [M, b, S] token ids — M microbatches of b sequences each.
    Returns nll [M] (summed shifted-CE × positions per microbatch, fp32 —
    exp(Σ nll / total_positions) is the reference perplexity). Layer
    params must be sharded over `pipe` (shard_params_pipeline); everything
    else replicated.
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    if arch not in ("llama", "moe"):
        raise NotImplementedError(
            "pipeline_nll supports the llama family and moe (RMSNorm head)"
        )
    arch_mod = get_arch(arch)
    qmeta_d = dict(qmeta) if qmeta is not None else None
    M, b, S = batches.shape
    L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    assert L % n_stages == 0, "layers must split evenly over stages"

    # precompute shared rope/mask exactly like the models' forward
    t0 = (batches[0, 0, 0] * 0).astype(jnp.int32)
    positions = jnp.arange(S) + t0

    def stage_body(layers_local, x):
        """Apply this stage's local layers to activations x [b, S, D]."""
        from qtpu.models.ops import rope_tables

        rope = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
        mask = jnp.arange(S)[None, :] <= positions[:, None]
        if 0 < cfg.sliding_window < S:
            mask &= jnp.arange(S)[None, :] > positions[:, None] - cfg.sliding_window
        mask = mask[None, None, :, :]

        def body(xc, lp):
            x_out, _ = arch_mod._layer_fwd(
                xc, lp, cfg, rope, mask, "none", qmeta_d
            )
            return x_out, None

        x, _ = jax.lax.scan(body, x, layers_local)
        return x

    def loss_of(x, ids):
        """Reference ppl math: fp32 shifted CE summed over positions."""
        from qtpu.models.ops import rms_norm
        from qtpu.models.ops import linear

        if "final_norm" in params:
            x = rms_norm(x, params["final_norm"], cfg.norm_eps)
        qmh = None if qmeta_d is None else qmeta_d.get("lm_head")
        logits = linear(x, params["lm_head"], qmh).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        ll = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll) * S  # mean CE × block (reference :318)

    D = cfg.hidden_size
    P_ = n_stages

    def pipelined(layers_local, batches_rep):
        """Runs on every pipe device; layers_local [L/P, ...]."""
        stage = jax.lax.axis_index("pipe")
        state = jnp.zeros((b, S, D), params["embed"].dtype)
        nll = jnp.zeros((M,), jnp.float32)

        def tick(t, carry):
            state, nll = carry
            # stage 0 injects microbatch t (clamped; masked when t ≥ M)
            mb = jnp.clip(t, 0, M - 1)
            ids = jax.lax.dynamic_index_in_dim(batches_rep, mb, 0, False)
            injected = params["embed"][ids].astype(params["embed"].dtype)
            state = jnp.where(
                (stage == 0) & (t < M), injected, state
            )
            state = stage_body(layers_local, state)
            # last stage: completed microbatch t − (P − 1)
            done_mb = t - (P_ - 1)
            ids_done = jax.lax.dynamic_index_in_dim(
                batches_rep, jnp.clip(done_mb, 0, M - 1), 0, False
            )
            loss = loss_of(state, ids_done)
            take = (stage == P_ - 1) & (done_mb >= 0)
            nll = jnp.where(
                (jnp.arange(M) == jnp.clip(done_mb, 0, M - 1)) & take,
                loss,
                nll,
            )
            # shift activations to the next stage for the next tick
            state = jax.lax.ppermute(
                state, "pipe", [(i, (i + 1) % P_) for i in range(P_)]
            )
            return state, nll

        state, nll = jax.lax.fori_loop(
            0, M + P_ - 1, tick, (state, nll)
        )
        # nll lives on the last stage; psum broadcasts it everywhere
        contrib = jnp.where(stage == P_ - 1, nll, jnp.zeros_like(nll))
        return jax.lax.psum(contrib, "pipe")

    layer_specs = jax.tree_util.tree_map(
        lambda a: P("pipe", *((None,) * (a.ndim - 1))), params["layers"]
    )
    kw = {}
    if "model" in mesh.axis_names:
        # manual only over the schedule axes; `model` stays a GSPMD auto
        # axis, so the stage-local matmuls keep their Megatron shardings
        # and XLA inserts the TP collectives inside each tick
        kw["axis_names"] = frozenset({"data", "pipe"})
    try:  # jax ≥ 0.8 names the replication check check_vma
        fn = shard_map(
            pipelined,
            mesh=mesh,
            in_specs=(layer_specs, P(*((None,) * 3))),
            out_specs=P(),
            check_vma=False,
            **kw,
        )
    except TypeError:
        fn = shard_map(
            pipelined,
            mesh=mesh,
            in_specs=(layer_specs, P(*((None,) * 3))),
            out_specs=P(),
            check_rep=False,
            **kw,
        )
    return fn(params["layers"], batches)
