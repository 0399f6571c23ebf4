"""Regenerate qtpu/quant/pot_log2_table.py.

Binary-searches, for every IEEE-754 float32 exponent e in [0, 126], the
smallest 23-bit mantissa field whose ratio m * 2^e satisfies
torch.round(torch.log2(ratio)) == e + 1, verifying monotonicity over a
±64-ulp window around each threshold. Run on CPU torch (the reference's
eval backend): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
tools/gen_pot_log2_table.py
"""

import numpy as np
import torch


def ref_E(m_bits: int, e: int) -> int:
    m = np.asarray(np.uint32(0x3F800000) | np.uint32(m_bits)).view(np.float32)
    r = torch.from_numpy((m * np.float32(2.0) ** np.float32(e)).reshape(1))
    return int(torch.round(torch.log2(r)).item())


def main(out="qtpu/quant/pot_log2_table.py"):
    ths = []
    for e in range(127):
        lo, hi = 0, 2**23 - 1
        assert ref_E(lo, e) == e and ref_E(hi, e) == e + 1, e
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if ref_E(mid, e) == e + 1:
                hi = mid
            else:
                lo = mid
        window = np.arange(max(0, hi - 64), min(2**23, hi + 64), dtype=np.uint32)
        m = (np.uint32(0x3F800000) | window).view(np.float32)
        r = torch.from_numpy(m * np.float32(2.0) ** np.float32(e))
        E = torch.round(torch.log2(r)).numpy()
        want = np.where(window < hi, e, e + 1)
        assert np.array_equal(E, want), (e, hi)
        ths.append(hi)

    vals = ", ".join(hex(int(x)) for x in ths)
    header = open(out).read().split("LOG2_ROUND_UP_BITS")[0]
    with open(out, "w") as f:
        f.write(header)
        f.write(
            "LOG2_ROUND_UP_BITS = np.asarray(\n    [%s],\n    dtype=np.uint32,\n)\n"
            % vals
        )
    print(f"wrote {len(ths)} thresholds to {out}")


if __name__ == "__main__":
    main()
