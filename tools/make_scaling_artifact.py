"""Generate results/scaling_virtual.json: the scaling_sweep + dryrun run on
the 8-device virtual CPU mesh, committed each round so the sharded path's
health is diffable (VERDICT r1 missing #3 / next #8). CPU numbers measure
FUNCTIONAL health, not hardware scaling — recorded as such."""
import json, os, sys, time, platform
sys.path.insert(0, "/root/repo")

# The axon sitecustomize may import jax before shell env vars are seen;
# force the virtual CPU mesh the way tests/conftest.py does (backend init
# is lazy, so this works as long as no array ops ran yet).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from qtpu.models import get_model_config
from qtpu.models.llama import init_params
from qtpu.bench.scaling import scaling_sweep
from qtpu.bench.synth import tiled_packed_llama

cfg = get_model_config("tiny-test")
params = init_params(cfg, jax.random.PRNGKey(0))

rows = scaling_sweep(
    params, cfg, mesh_shapes=((1, 1), (2, 1), (4, 1), (2, 2), (4, 2), (2, 4)),
    batch_per_data_shard=4, prompt_len=16, n_steps=8,
)
packed, qmeta = tiled_packed_llama(cfg, 4, 64)
rows_packed = scaling_sweep(
    packed, cfg, qmeta=qmeta,
    mesh_shapes=((1, 1), (4, 1), (2, 2)),
    batch_per_data_shard=4, prompt_len=16, n_steps=8,
)
out = {
    "note": (
        "Virtual 8-device CPU mesh (xla_force_host_platform_device_count):"
        " exercises the full sharded decode path (DP batch sharding + TP"
        " weight/KV sharding, GSPMD collectives). CPU throughput numbers"
        " validate FUNCTIONAL health and compile-ability only — hardware"
        " scaling efficiency requires a real pod slice (BASELINE.md 'Not"
        " published')."
    ),
    "backend": jax.default_backend(),
    "devices": len(jax.devices()),
    "jax_version": jax.__version__,
    "platform": platform.platform(),
    "model": "tiny-test",
    "dense_bf16": rows,
    "packed_w4": rows_packed,
}
with open("/root/repo/results/scaling_virtual.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"ok": True, "rows": len(rows) + len(rows_packed)}))
