"""Probe: Pallas dynamic single-row store into an aliased int8 ref.

If this works, the decode attention kernel can write the new KV row
in-place (45 KB/step) instead of a masked full-cache rewrite (~40 MB/step).
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, hd = 64, 64

def kern(pos_ref, row_ref, cache_ref, o_ref):
    pos = pos_ref[0]
    # out aliased to cache input: write only the target row
    o_ref[pl.dslice(pos, 1), :] = row_ref[:]

@partial(jax.jit, donate_argnums=(0,))
def put(cache, row, pos):
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, hd), lambda i, pos: (0, 0)),
                pl.BlockSpec((S, hd), lambda i, pos: (0, 0)),
            ],
            out_specs=pl.BlockSpec((S, hd), lambda i, pos: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((S, hd), jnp.int8),
        input_output_aliases={1: 0},
    )(pos.reshape(1), row, cache)

cache = jnp.arange(S * hd, dtype=jnp.int32).astype(jnp.int8).reshape(S, hd)
want = np.asarray(cache)
row = jnp.full((1, hd), 7, jnp.int8)
out = put(cache, row, jnp.asarray(13, jnp.int32))
got = np.asarray(out)
want[13] = 7
print("row store ok:", np.array_equal(got, want))
