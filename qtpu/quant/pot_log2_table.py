"""Frozen torch-exact E-decision table for POT quantization.

The reference computes E = torch.round(torch.log2(ratio)) per weight
(pot_apot_quantizer.py:85-90). torch-CPU's log2 (Sleef, <=1 ulp — NOT
correctly rounded) lands a PLATEAU of mantissas exactly on each
half-integer k+0.5 (plateau width grows with k: result ulp is 2^(k_bits-23)
while dlog2/dm is ~0.5/ulp(m)), and torch.round then resolves those
half-to-even. XLA's log2 rounds those boundary mantissas differently,
which at W8 (E range [0,127] — ratios up to 2^127, wide plateaus) flipped
enough group scales for a -0.51 ppl crosscheck gap (docs/ACCURACY.md r4).

This table makes the decision EXACT without any transcendental: for
ratio = m * 2^e (m in [1,2), exact IEEE-754 decomposition),
round(log2f(m * 2^e)) == e + (mantissa_bits(m) >= LOG2_ROUND_UP_BITS[e]).
Each of the 127 thresholds was binary-searched directly against
torch.round(torch.log2(...)) on torch 2.13.0 cpu and verified over a
+-64-ulp window (tools/gen_pot_log2_table.py regenerates it).
"""

from __future__ import annotations

import numpy as np

#: index e in [0, 126] -> smallest 23-bit mantissa field whose ratio
#: m * 2^e rounds up to E = e + 1. (e >= 127 cannot occur for finite f32;
#: e < 0 always clips to E = 0 through jnp.clip.)
LOG2_ROUND_UP_BITS = np.asarray(
    [0x3504f4, 0x3504f3, 0x3504f5, 0x3504f3, 0x3504f6, 0x3504f2, 0x3504f6, 0x3504f2, 0x3504f8, 0x3504f0, 0x3504f8, 0x3504f0, 0x3504f8, 0x3504f0, 0x3504f8, 0x3504f0, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x3504fc, 0x3504ec, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350503, 0x3504e4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513, 0x3504d4, 0x350513],
    dtype=np.uint32,
)
