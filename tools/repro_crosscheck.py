#!/usr/bin/env python
"""Cross-stack accuracy check: run the REFERENCE's torch quantizers and
qtpu's pipeline on the SAME model weights and the SAME tokens, fully
offline, and compare per-method perplexity deltas.

Zero-egress container ⇒ the real TinyLlama + WikiText-2 runs
(/root/reference/results/benchmark_results_{4,8}bit.json) cannot execute
here. This is the strongest offline substitute: a tiny random-weight HF
Llama (GQA, fp32) is saved to disk once; the reference stack
(quantization_utils.get_calib_feat → awq/gptq/pot/apot quantizers →
quantization_utils.evaluate_perplexity) and the qtpu stack
(qtpu.bench.QuantizationBenchmark on the imported checkpoint + frozen
token fixture, reference-parity method configs) each quantize and evaluate
it end-to-end. Matching Δppl per method demonstrates the two pipelines
compute the same thing on real checkpoints too — the remaining gap to the
published numbers is only the data/weights, which tools/repro_real.py
covers on any machine with HF caches.

Writes results/accuracy_crosscheck.json and prints the delta table.

Runs on CPU (torch is CPU-only here; the tiny model makes this fast).
MUST be launched with CPU jax selected at the SHELL level — the axon
sitecustomize initializes jax at interpreter startup, before this file
runs, so in-script env vars are too late:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/repro_crosscheck.py
"""

import argparse
import copy
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np

VOCAB, HIDDEN, INTER, LAYERS, HEADS, KV_HEADS = 1024, 512, 1024, 4, 8, 4
N_CALIB, CALIB_BLOCK = 32, 512
N_TEST, TEST_BLOCK = 8, 512
GROUP = 128


def build_checkpoint(tmp: str):
    """Tiny random HF Llama saved as a local checkpoint (fp32)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        intermediate_size=INTER,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS,
        max_position_embeddings=2048,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).float().eval()
    model.save_pretrained(tmp, safe_serialization=True)
    return model


def make_tokens():
    """Zipf-distributed tokens with short-range repetition — structured
    enough that quantization error moves perplexity the way it does on
    text, deterministic so both stacks see identical streams."""
    rng = np.random.default_rng(42)
    n = N_CALIB * CALIB_BLOCK + N_TEST * TEST_BLOCK + 1
    base = rng.zipf(1.3, size=2 * n) % VOCAB
    base = base[:n].astype(np.int64)
    # repetition structure: every 3rd position echoes position-7 back
    base[7::3] = base[: len(base[7::3])]
    calib = [base[i * CALIB_BLOCK : (i + 1) * CALIB_BLOCK] for i in range(N_CALIB)]
    test = base[N_CALIB * CALIB_BLOCK :][: N_TEST * TEST_BLOCK].reshape(1, -1)
    return calib, test


def run_reference(model, calib, test, w_bit: int):
    """Drive /root/reference's quantizers + evaluator verbatim."""
    import torch

    sys.path.insert(0, "/root/reference")
    from awq_quantizer import awq_quantize_model_weight
    from gptq_quantizer import gptq_quantize_model_weight
    from pot_apot_quantizer import (
        apot_quantize_model_weight,
        pot_quantize_model_weight,
    )
    from quantization_utils import (
        evaluate_perplexity,
        get_calib_feat,
        pseudo_quantize_tensor,
    )

    calib_t = [torch.from_numpy(c).reshape(1, -1) for c in calib]
    test_t = torch.from_numpy(test)

    input_feat = get_calib_feat(model, None, calib_t, verbose=False)

    def ppl(m):
        return evaluate_perplexity(
            m, None, test_t, n_samples=N_TEST, block_size=TEST_BLOCK,
            verbose=False,
        )

    out = {"raw": ppl(model)}

    m = copy.deepcopy(model)
    awq_quantize_model_weight(
        m, w_bit, GROUP, input_feat, protect_ratio=0.01, scale_factor=2.0
    )
    out["awq"] = ppl(m)

    m = copy.deepcopy(model)
    gptq_quantize_model_weight(
        m, w_bit, GROUP, input_feat, perp_damp=0.01, blocksize=128,
        nsamples=128, actorder=False, verbose=False,
    )
    out["gptq"] = ppl(m)

    m = copy.deepcopy(model)
    pot_quantize_model_weight(m, w_bit, GROUP)
    out["pot"] = ppl(m)

    m = copy.deepcopy(model)
    apot_quantize_model_weight(m, w_bit, GROUP, k=2)
    out["apot"] = ppl(m)

    # SmoothQuant: act scales collected on the RAW model (as the reference
    # orchestrator does, benchmark_runner.py:603-617); smooth_weights'
    # forward pre-hook keeps the eval numerically equivalent. α=0.85 is
    # the reference's own published-blow-up configuration
    # (benchmark_results.json:75, ppl 54.13 vs 12.09 raw at W8).
    from smooth_quant_quantizer import (
        collect_act_scales,
        smoothquant_quantize_model_weight,
    )

    for alpha, name in ((0.5, "smoothquant"), (0.85, "smoothquant_a085")):
        m = copy.deepcopy(model)
        act_scales = collect_act_scales(m, calib_t, verbose=False)
        smoothquant_quantize_model_weight(
            m, w_bit, GROUP, act_scales, alpha=alpha, verbose=False
        )
        out[name] = ppl(m)

    # RTN = the reference's pseudo_quantize_tensor applied to every linear
    # (its GPTQ fallback path, gptq_quantizer._simple_quantize_layer)
    import torch.nn as nn

    m = copy.deepcopy(model)
    for _, mod in m.named_modules():
        if isinstance(mod, nn.Linear):
            mod.weight.data = pseudo_quantize_tensor(
                mod.weight.data, n_bit=w_bit, q_group_size=GROUP
            )
    out["rtn"] = ppl(m)
    return out


def run_qtpu(ckpt_dir: str, fixture_dir: str, w_bit: int):
    import jax

    assert jax.default_backend() == "cpu", (
        "launch with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu — the axon"
        " sitecustomize grabs the (single, shared) TPU chip otherwise"
    )
    from qtpu.bench import QuantizationBenchmark

    ds = f"fixture:{fixture_dir}"
    config = {
        "model_name": "crosscheck-tiny",
        "checkpoint_path": ckpt_dir,
        "dtype": "float32",
        "quantization_methods": [
            "rtn", "awq", "gptq", "pot", "apot", "smoothquant"
        ],
        "calibration_dataset": ds,
        "calibration_dataset_config": None,
        "calibration_split": "train",
        "test_dataset": ds,
        "test_dataset_config": None,
        "test_split": "test",
        "n_calibration_samples": N_CALIB,
        "calibration_block_size": CALIB_BLOCK,
        "n_test_samples": N_TEST,
        "test_block_size": TEST_BLOCK,
        "packed_eval": True,
        "quantization_config": {
            "rtn": {"w_bit": w_bit, "q_group_size": GROUP},
            "awq": {"w_bit": w_bit, "q_group_size": GROUP,
                    "protect_ratio": 0.01, "scale_factor": 2.0},
            # reference parity: proxy Hessian, no error compensation
            "gptq": {"w_bit": w_bit, "q_group_size": GROUP,
                     "perp_damp": 0.01, "blocksize": 128, "nsamples": 128,
                     "actorder": False, "error_compensation": False},
            "pot": {"w_bit": w_bit, "q_group_size": GROUP},
            "apot": {"w_bit": w_bit, "q_group_size": GROUP, "k": 2},
            "smoothquant": {
                "w_bit": w_bit, "q_group_size": GROUP, "alpha": 0.5
            },
        },
        "verbose": False,
    }

    def collect(cfg):
        bench = QuantizationBenchmark(cfg)
        bench.run_all_benchmarks()
        res = {}
        for name, r in bench.results.items():
            if r.error:
                res[name] = {"error": r.error}
            else:
                res[name] = {
                    "perplexity": r.perplexity,
                    "packed_perplexity": r.packed_perplexity,
                }
        return res

    out = collect(config)
    # second pass: the reference's published blow-up config (alpha=0.85)
    cfg85 = dict(config)
    cfg85["quantization_methods"] = ["smoothquant"]
    cfg85["quantization_config"] = {
        "smoothquant": {"w_bit": w_bit, "q_group_size": GROUP, "alpha": 0.85}
    }
    out["smoothquant_a085"] = collect(cfg85)["smoothquant"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w-bit", type=int, default=4, choices=(2, 4, 8))
    ap.add_argument(
        "--out", default="/root/repo/results/accuracy_crosscheck.json"
    )
    args = ap.parse_args()

    calib, test = make_tokens()
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        model = build_checkpoint(ckpt)

        fix = os.path.join(tmp, "fixture")
        from qtpu.data.fixture import save_fixture

        save_fixture(
            fix, [c.reshape(1, -1) for c in calib], test,
            {"model_name": "crosscheck-tiny", "dataset": "synthetic-zipf-42"},
        )

        print(f"reference stack (torch, /root/reference) W{args.w_bit} ...")
        ref = run_reference(model, calib, test, args.w_bit)
        del model
        print(f"qtpu stack (jax cpu) W{args.w_bit} ...")
        qt = run_qtpu(ckpt, fix, args.w_bit)

    rows = []
    print(
        f"\n{'method':<8} {'ref ppl':>10} {'ref Δ':>9} {'qtpu ppl':>10} "
        f"{'qtpu Δ':>9} {'packed ppl':>11} {'Δ gap':>8}"
    )
    raw_ref = ref["raw"]
    raw_qt = qt["raw"]["perplexity"]
    methods = (
        "raw", "rtn", "awq", "gptq", "pot", "apot",
        "smoothquant", "smoothquant_a085",
    )
    for m in methods:
        r, q = ref.get(m), qt.get(m, {})
        qp = q.get("perplexity", float("nan"))
        pp = q.get("packed_perplexity")
        d_ref = r - raw_ref
        d_qt = qp - raw_qt
        rows.append(
            {
                "method": m,
                "reference_ppl": r,
                "reference_delta": d_ref,
                "qtpu_ppl": qp,
                "qtpu_delta": d_qt,
                "qtpu_packed_ppl": pp,
                "delta_gap": d_qt - d_ref,
            }
        )
        print(
            f"{m:<8} {r:>10.4f} {d_ref:>9.4f} {qp:>10.4f} {d_qt:>9.4f} "
            f"{(pp if pp is not None else float('nan')):>11.4f} "
            f"{d_qt - d_ref:>8.4f}"
        )

    out = {
        "note": (
            "Offline cross-stack check: reference torch quantizers vs the"
            " qtpu pipeline on one tiny random-weight HF Llama (GQA, fp32)"
            " and one frozen synthetic token stream — identical weights,"
            " identical tokens, reference-parity method configs"
            f" (w_bit={args.w_bit}, group={GROUP}). Validates pipeline"
            " equality end-to-end; real-data magnitudes come from"
            " tools/repro_real.py on a machine with HF caches."
        ),
        "model": {
            "vocab": VOCAB, "hidden": HIDDEN, "intermediate": INTER,
            "layers": LAYERS, "heads": HEADS, "kv_heads": KV_HEADS,
        },
        "eval": {"n_blocks": N_TEST, "block_size": TEST_BLOCK},
        "calib": {"n_samples": N_CALIB, "block_size": CALIB_BLOCK},
        "w_bit": args.w_bit,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    prev = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
    prev[f"w{args.w_bit}"] = out
    with open(args.out, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"\nwrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
