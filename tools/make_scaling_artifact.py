"""Generate results/scaling_virtual.json: the scaling_sweep + a pipelined
eval run on the 8-device virtual CPU mesh, committed each round so the
sharded path's health is diffable (VERDICT r2 weak #6 / task #9). CPU
numbers measure FUNCTIONAL health, not hardware scaling — recorded as such.
Dense and packed sweeps cover the SAME mesh-shape grid; each shape is
measured 3× (best kept, trials recorded) because dp > 1 on the virtual
mesh oversubscribes host threads."""
import json, os, sys, time, platform
sys.path.insert(0, "/root/repo")

# Force the virtual CPU mesh the way tests/conftest.py does (backend init
# is lazy, so this works as long as no array ops ran yet). Only append the
# flag when absent so running under the test harness does not duplicate it
# (ADVICE r2).
_FLAG = "xla_force_host_platform_device_count"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --{_FLAG}=8"
    )
import jax

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"virtual mesh did not take effect ({len(jax.devices())} devices) — "
    "jax backend was initialized before this script could set XLA_FLAGS "
    "(e.g. array ops in sitecustomize); run in a fresh interpreter"
)
import jax.numpy as jnp

from qtpu.models import get_model_config
from qtpu.models.llama import init_params
from qtpu.bench.scaling import scaling_sweep
from qtpu.bench.synth import tiled_packed_llama

GRID = ((1, 1), (2, 1), (4, 1), (2, 2), (4, 2), (2, 4), (8, 1))

cfg = get_model_config("tiny-test")
params = init_params(cfg, jax.random.PRNGKey(0))

rows = scaling_sweep(
    params, cfg, mesh_shapes=GRID, repeats=3,
    batch_per_data_shard=4, prompt_len=16, n_steps=8,
)
packed, qmeta = tiled_packed_llama(cfg, 4, 64)
rows_packed = scaling_sweep(
    packed, cfg, qmeta=qmeta, mesh_shapes=GRID, repeats=3,
    batch_per_data_shard=4, prompt_len=16, n_steps=8,
)

# pipeline-parallel eval health: pipelined NLL at pipe ∈ {2, 4} equals the
# single-device number (the config-driven eval path, runner mesh.pipe)
from qtpu.eval.perplexity import evaluate_perplexity
from qtpu.sharding.pipeline import make_pipe_mesh, shard_params_pipeline

ids = jax.random.randint(jax.random.PRNGKey(7), (1, 4 * 32), 0, cfg.vocab_size)
ppl_single = evaluate_perplexity(params, ids, cfg, n_samples=4, block_size=32)
pipe_rows = []
for pp in (2,):  # tiny-test has 2 layers — the only even stage split
    mesh = make_pipe_mesh(pipe=pp)
    sp = shard_params_pipeline(params, mesh)
    t0 = time.perf_counter()
    ppl = evaluate_perplexity(
        sp, ids, cfg, n_samples=4, block_size=32, mesh=mesh
    )
    pipe_rows.append(
        {
            "mesh": {"pipe": pp},
            "devices": pp,
            "perplexity": ppl,
            "matches_single_device": bool(abs(ppl - ppl_single) < 2e-2 * ppl_single),
            "wall_seconds_incl_compile": round(time.perf_counter() - t0, 3),
        }
    )

out = {
    "note": (
        "Virtual 8-device CPU mesh (xla_force_host_platform_device_count):"
        " exercises the full sharded decode path (DP batch sharding + TP"
        " weight/KV sharding, GSPMD collectives) plus the pipelined eval"
        " schedule. CPU throughput numbers validate FUNCTIONAL health and"
        " compile-ability only — hardware scaling efficiency requires a"
        " real pod slice (BASELINE.md 'Not published'). dp > 1 shapes"
        " oversubscribe host CPU threads, so efficiencies below 1/devices"
        " are expected noise there; best-of-3 per shape, trials recorded."
    ),
    "backend": jax.default_backend(),
    "devices": len(jax.devices()),
    "jax_version": jax.__version__,
    "platform": platform.platform(),
    "model": "tiny-test",
    "dense_bf16": rows,
    "packed_w4": rows_packed,
    "pipeline_eval": {"single_device_ppl": ppl_single, "runs": pipe_rows},
}
with open("/root/repo/results/scaling_virtual.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"ok": True, "rows": len(rows) + len(rows_packed) + len(pipe_rows)}))
