from qtpu.quant.rtn import pseudo_quantize, symmetric_fake_quantize  # noqa: F401
from qtpu.quant.pot import pot_quantize_tensor  # noqa: F401
from qtpu.quant.apot import apot_quantize_tensor, generate_apot_levels  # noqa: F401
from qtpu.quant.awq import awq_quantize  # noqa: F401
from qtpu.quant.gptq import gptq_quantize_layer  # noqa: F401
from qtpu.quant.smoothquant import (  # noqa: F401
    compute_smoothing_scales,
    smoothquant_quantize,
)
from qtpu.quant.apply import quantize_model  # noqa: F401
