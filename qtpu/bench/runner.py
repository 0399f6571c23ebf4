"""Config-driven benchmark orchestrator (reference C17,
benchmark_runner.py:91-743).

Same phases as the reference: setup → raw baseline → per-method quantize +
eval with per-method error isolation, timing, summary table with
improvements-vs-raw, and reference-schema JSON persistence. Differences by
design:

- No per-method model "reload": params are immutable pytrees, so every
  method starts from the same pristine params by construction (the
  reference must reload from disk because it mutates modules in place,
  benchmark_runner.py:266-275).
- Calibration statistics are collected once and reused across methods
  (mean-abs, max-abs and optional Hessians come from one capture pass).
- One extra method "rtn" (plain RTN baseline) beyond the reference's five.

CLI:  python -m qtpu.bench <config.json>
"""

from __future__ import annotations

import json
import time
import traceback
from datetime import datetime

import jax
import numpy as np

from qtpu.bench.results import BenchmarkResult
from qtpu.calib import collect_calibration_stats
from qtpu.configs import load_config, validate_config
from qtpu.core.dtypes import MiB, resolve_dtype
from qtpu.core.sizing import count_params, get_model_size
from qtpu.data import get_calibration_dataset, get_test_dataset
from qtpu.eval import evaluate_perplexity
from qtpu.models import get_arch, get_model_config
from qtpu.quant import quantize_model

METHODS = ("awq", "gptq", "pot", "apot", "smoothquant", "rtn")


class QuantizationBenchmark:
    def __init__(self, config, verbose: bool | None = None):
        if isinstance(config, (str, bytes)) or hasattr(config, "__fspath__"):
            config = load_config(config)
        self.config = validate_config(config)
        self.verbose = (
            self.config.get("verbose", True) if verbose is None else verbose
        )
        self.model_cfg = None
        self.mesh = None
        self.params = None
        self.tokenizer = None
        self.calib_samples = None
        self.test_dataset = None
        self.stats = None
        self.results: dict[str, BenchmarkResult] = {}

    def log(self, msg: str):
        if self.verbose:
            print(msg)

    # ------------------------------------------------------------- setup
    def setup(self):
        cfg = self.config
        self.log(f"Setting up benchmark for {cfg['model_name']}...")
        dtype = resolve_dtype(cfg.get("dtype", "bfloat16"))
        ckpt = cfg.get("checkpoint_path")
        if ckpt:
            # local HF checkpoint: model config comes from its config.json
            # (reference C3's from_pretrained role; no network egress here)
            from qtpu.models.hf_import import load_checkpoint

            self.params, self.tokenizer = load_checkpoint(ckpt, None, dtype)
            from qtpu.models.hf_import import config_from_hf

            self.model_cfg = config_from_hf(ckpt)
            self.arch = get_arch(self.model_cfg.arch)
        else:
            self.model_cfg = get_model_config(cfg["model_name"])
            self.arch = get_arch(self.model_cfg.arch)
        if not ckpt:
            self.params = self.arch.init_params(
                self.model_cfg, jax.random.PRNGKey(cfg.get("seed", 0)), dtype
            )
            self.tokenizer = None

        self.test_dataset = get_test_dataset(
            self.tokenizer,
            cfg["test_dataset"],
            cfg.get("test_dataset_config"),
            cfg.get("test_split", "test"),
            n_samples=cfg.get("n_test_samples", 40),
            block_size=cfg.get("test_block_size", 2048),
            vocab_size=self.model_cfg.vocab_size,
        )
        self.calib_samples = get_calibration_dataset(
            self.tokenizer,
            cfg["calibration_dataset"],
            cfg.get("calibration_dataset_config"),
            cfg.get("calibration_split", "validation"),
            n_samples=cfg.get("n_calibration_samples", 256),
            block_size=cfg.get("calibration_block_size", 512),
            vocab_size=self.model_cfg.vocab_size,
        )
        self._setup_mesh()
        self.log("Setup complete!")

    def _setup_mesh(self):
        """Build the device mesh from config["mesh"] when more than one
        device is requested and available. `{"data": dp, "model": tp}`
        builds a ('data','model') mesh with Megatron TP shardings;
        `{"pipe": P}` (with model == 1) builds a ('data','pipe') mesh and
        shards the stacked layer axis over stages — eval then routes to
        the GPipe schedule (qtpu.sharding.pipeline.pipeline_nll)."""
        self.mesh = None
        mcfg = self.config.get("mesh") or {}
        dp, tp = int(mcfg.get("data", 1)), int(mcfg.get("model", 1))
        pp = int(mcfg.get("pipe", 1))
        n_dev = len(jax.devices())
        if dp == -1:
            dp = max(1, n_dev // max(tp * pp, 1))
        if dp * tp * pp <= 1:
            return
        if dp * tp * pp > n_dev:
            self.log(
                f"mesh {dp}x{tp}x{pp} needs {dp * tp * pp} devices, have "
                f"{n_dev} — running single-device"
            )
            return
        if pp > 1:
            if self.model_cfg.num_layers % pp:
                self.log(
                    f"mesh: {self.model_cfg.num_layers} layers do not "
                    f"split over pipe={pp} — running single-device"
                )
                return
            from qtpu.sharding.pipeline import (
                make_pipe_mesh,
                shard_params_pipeline,
            )

            # tp > 1 composes: stage-local Megatron shardings ride the
            # mesh's `model` axis as a GSPMD auto axis inside the GPipe
            # shard_map (sharding/pipeline.py)
            self.mesh = make_pipe_mesh(pp, data=dp, model=tp)
            self.params = shard_params_pipeline(
                self.params, self.mesh, arch=self.model_cfg.arch
            )
            self.log(f"mesh: data={dp} x pipe={pp} x model={tp}")
            return
        from qtpu.sharding import make_mesh, shard_params

        self.mesh = make_mesh(data=dp, model=tp)
        self.params = shard_params(self.params, self.mesh, arch=self.model_cfg.arch)
        self.log(f"mesh: data={dp} x model={tp}")

    def _prepare_activations(self, need_hessian: bool):
        if self.stats is not None and (
            not need_hessian or self.stats.hessian is not None
        ):
            return
        self.log("\nCollecting activation statistics...")
        if self.mesh is not None:
            from qtpu.calib.sharded import collect_calibration_stats_sharded

            self.stats = collect_calibration_stats_sharded(
                self.arch.forward,
                self.params,
                [np.asarray(b) for b in self.calib_samples],
                self.model_cfg,
                self.mesh,
                collect_hessian=need_hessian,
            )
        else:
            self.stats = collect_calibration_stats(
                self.arch.forward,
                self.params,
                [np.asarray(b) for b in self.calib_samples],
                self.model_cfg,
                collect_hessian=need_hessian,
                verbose=self.verbose,
            )

    # ------------------------------------------------------------ metrics
    def _original_size_bytes(self) -> int:
        itemsize = np.dtype(
            resolve_dtype(self.config.get("dtype", "bfloat16"))
        ).itemsize
        return count_params(self.params) * itemsize

    def _fill_size(self, result, data_width, group_size, use_zero_point):
        size_bits = get_model_size(
            self.params,
            data_width=data_width,
            group_size=group_size,
            use_zero_point=use_zero_point,
        )
        result.model_size_bits = size_bits
        result.model_size_mb = size_bits / (8 * MiB)
        orig = self._original_size_bytes()
        result.bits_per_byte = size_bits / orig if orig > 0 else None

    def _eval(self, params, qmeta=None) -> float:
        import contextlib

        profile_dir = self.config.get("profile_dir")
        ctx = contextlib.nullcontext()
        if profile_dir:
            from qtpu.utils.timing import profile_trace

            ctx = profile_trace(profile_dir)  # Perfetto/TensorBoard trace
        with ctx:
            return evaluate_perplexity(
                params,
                np.asarray(self.test_dataset),
                self.model_cfg,
                n_samples=self.config.get("n_test_samples", 40),
                block_size=self.config.get("test_block_size", 2048),
                qmeta=qmeta,
                arch=self.model_cfg.arch,
                mesh=self.mesh,
                verbose=self.verbose,
            )

    # ------------------------------------------------------- method runs
    def benchmark_raw_model(self):
        self.log("\n" + "=" * 80 + "\nEVALUATING RAW MODEL\n" + "=" * 80)
        result = BenchmarkResult("raw", {})
        try:
            start = time.time()
            result.perplexity = self._eval(self.params)
            self._fill_size(result, data_width=32, group_size=-1, use_zero_point=True)
            result.runtime_seconds = time.time() - start
            self.log(f"✓ {result}")
        except Exception as e:  # error isolation, reference :243-245
            result.error = str(e)
            traceback.print_exc()
            self.log(f"✗ Raw Model - Error: {e}")
        self.results["raw"] = result
        return result

    def benchmark_method(self, method: str):
        if method not in self.config["quantization_methods"]:
            return None
        mcfg = self.config["quantization_config"][method]
        if isinstance(mcfg.get("w_bit"), (list, tuple)):
            # bit-width sweep: one run per width, recorded as method@wN
            results = []
            for wb in mcfg["w_bit"]:
                sub = dict(mcfg, w_bit=int(wb))
                results.append(
                    self._benchmark_one(method, sub, name=f"{method}@w{wb}")
                )
            return results
        return self._benchmark_one(method, mcfg, name=method)

    def _benchmark_one(self, method: str, mcfg: dict, name: str):
        self.log("\n" + "=" * 80 + f"\nBENCHMARKING {name.upper()}\n" + "=" * 80)
        result = BenchmarkResult(name, mcfg)
        try:
            start = time.time()
            needs_stats = method in ("awq", "gptq", "smoothquant")
            stats = None
            if needs_stats:
                need_h = method == "gptq" and mcfg.get(
                    "error_compensation", False
                ) and mcfg.get("true_hessian", True)
                self._prepare_activations(need_hessian=need_h)
                stats = self.stats
            qparams = quantize_model(
                self.params, method, mcfg, stats, arch=self.model_cfg.arch
            )
            jax.block_until_ready(qparams)
            quant_time = time.time() - start
            self.log(f"  quantization took {quant_time:.2f}s")
            result.perplexity = self._eval(qparams)
            self._fill_size(
                result,
                data_width=mcfg["w_bit"],
                group_size=mcfg.get("q_group_size", -1),
                use_zero_point=method not in ("pot", "apot"),
            )
            result.runtime_seconds = time.time() - start
            if self.config.get("packed_eval", False):
                self._packed_eval(result, method, mcfg, stats)
            self.log(f"✓ {result}")
        except Exception as e:
            result.error = str(e)
            traceback.print_exc()
            self.log(f"✗ {name} - Error: {e}")
        self.results[name] = result
        return result

    def _packed_eval(self, result, method, mcfg, stats):
        """Packed-vs-fake accuracy audit ("packed_eval": true): evaluate
        perplexity of the REALLY-PACKED artifact of the same method through
        the fused dequant kernels (fold_smooth + fuse applied — the exact
        serving path), recorded as packed_perplexity next to the fake-quant
        number. Catches serving-only accuracy drift the reference cannot
        even express: APOT's 4-bit code cap (16 levels vs fake-quant's 32),
        GPTQ g_idx actorder gathers, smooth folding's bf16 re-rounding."""
        from qtpu.quant.apply import fold_smooth, fuse_packed_sites, pack_model

        try:
            packed, qmeta = pack_model(
                self.params, method, mcfg, stats, arch=self.model_cfg.arch
            )
            packed, qmeta = fold_smooth(packed, qmeta, arch=self.model_cfg.arch)
            packed, qmeta = fuse_packed_sites(
                packed, qmeta, arch=self.model_cfg.arch
            )
            result.packed_perplexity = self._eval(packed, qmeta=qmeta)
            self.log(
                f"  packed-vs-fake ppl: {result.packed_perplexity:.4f}"
                f" vs {result.perplexity:.4f}"
            )
        except Exception as e:  # packed path failure must not kill the run
            result.packed_error = str(e)
            self.log(f"  packed eval failed: {e}")

    # shims matching the reference's per-method entry points
    def benchmark_awq(self):
        return self.benchmark_method("awq")

    def benchmark_gptq(self):
        return self.benchmark_method("gptq")

    def benchmark_pot(self):
        return self.benchmark_method("pot")

    def benchmark_apot(self):
        return self.benchmark_method("apot")

    def benchmark_smoothquant(self):
        return self.benchmark_method("smoothquant")

    def benchmark_serving(self, method: str | None = None):
        """Decode-throughput benchmark through the packed serving path
        (tokens/s/chip — the metric BASELINE.md notes the reference never
        publishes). Records a 'serving' pseudo-method result. Enabled via
        config["serving"]["benchmark"] = true."""
        scfg = self.config.get("serving", {})
        method = method or scfg.get("pack_method", "rtn")
        mcfg = self.config["quantization_config"].get(
            method, {"w_bit": 4, "q_group_size": 128}
        )
        result = BenchmarkResult("serving", {"pack_method": method, **mcfg})
        try:
            import jax.numpy as jnp

            from qtpu.quant.apply import pack_model
            from qtpu.serve import init_cache
            from qtpu.serve.decode import decode_step, prefill

            start = time.time()
            needs_stats = method in ("awq", "smoothquant")
            if needs_stats:
                self._prepare_activations(need_hessian=False)
            packed, qmeta = pack_model(
                self.params,
                method,
                mcfg,
                self.stats if needs_stats else None,
                arch=self.model_cfg.arch,
            )
            from qtpu.quant.apply import fold_smooth, fuse_packed_sites

            packed, qmeta = fold_smooth(packed, qmeta, arch=self.model_cfg.arch)
            packed, qmeta = fuse_packed_sites(
                packed, qmeta, arch=self.model_cfg.arch
            )
            B = int(scfg.get("max_batch_size", 8))
            P = min(128, self.model_cfg.max_seq_len // 2)
            quant_kv = scfg.get("kv_cache_dtype", "int8") == "int8"
            prompt = jnp.asarray(
                np.random.default_rng(0).integers(
                    0, self.model_cfg.vocab_size, (B, P)
                ),
                jnp.int32,
            )

            def run(n_steps):
                cache = init_cache(
                    self.model_cfg, B, P + 64, quantized=quant_kv
                )
                t0 = time.perf_counter()
                logits, cache = prefill(
                    packed, prompt, cache, self.model_cfg, qmeta,
                    arch=self.model_cfg.arch,
                )
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                pos = jnp.full((B,), P, jnp.int32)
                for _ in range(n_steps):
                    logits, cache = decode_step(
                        packed, tok, pos, cache, self.model_cfg, qmeta,
                        arch=self.model_cfg.arch,
                    )
                    tok = jnp.argmax(logits, -1).astype(jnp.int32)
                    pos = pos + 1
                float(jnp.sum(tok))
                return time.perf_counter() - t0

            run(2)  # compile
            per_tok = max((run(34) - run(2)) / 32, 1e-9)
            result.perplexity = None
            result.runtime_seconds = time.time() - start
            result.error = None
            result.tokens_per_second = B / per_tok
            self.log(
                f"✓ serving[{method}]: {B / per_tok:.1f} tokens/s/chip "
                f"(batch {B}, {'int8' if quant_kv else 'bf16'} KV)"
            )
        except Exception as e:
            result.error = str(e)
            traceback.print_exc()
            self.log(f"✗ serving - Error: {e}")
        self.results["serving"] = result
        return result

    def run_all_benchmarks(self):
        self.setup()
        self.benchmark_raw_model()
        for method in METHODS:
            self.benchmark_method(method)
        if self.config.get("serving", {}).get("benchmark", False):
            self.benchmark_serving()
        art = self.config.get("save_artifacts")
        if art:
            try:
                self.save_artifacts(art["dir"], art.get("method", "rtn"))
            except Exception as e:
                traceback.print_exc()
                self.log(f"✗ artifact save failed: {e}")
        self.print_summary()

    # ---------------------------------------------------------- reporting
    def print_summary(self):
        self.log("\n" + "=" * 80 + "\nBENCHMARK SUMMARY\n" + "=" * 80)
        self.log(f"\nModel: {self.config['model_name']}")
        self.log(f"Calibration: {self.config['calibration_dataset']}")
        self.log(f"Test Dataset: {self.config['test_dataset']}")
        self.log(f"Timestamp: {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}")
        self.log("-" * 100)
        for result in self.results.values():
            self.log(str(result))
        self.log("-" * 100)
        raw = self.results.get("raw")
        if raw and raw.is_success():
            self.log("\nImprovements vs Raw Model:")
            for name, result in self.results.items():
                if (
                    name != "raw"
                    and result.is_success()
                    and result.perplexity is not None
                ):
                    ppl_deg = (result.perplexity / raw.perplexity - 1) * 100
                    size_red = (1 - result.model_size_mb / raw.model_size_mb) * 100
                    self.log(
                        f"  {name:10s}: PPL {ppl_deg:+6.2f}% | Size -{size_red:6.2f}%"
                    )
        self.log("=" * 100 + "\n")

    def save_artifacts(self, out_dir: str, method: str):
        """Persist the packed artifact of one method (qtpu.ckpt) so
        calibration decouples from serving. Configured via
        config["save_artifacts"] = {"dir": ..., "method": ...}."""
        from qtpu.ckpt import save_quantized
        from qtpu.quant.apply import pack_model

        mcfg = self.config["quantization_config"][method]
        needs_stats = method in ("awq", "smoothquant", "gptq")
        if needs_stats:
            self._prepare_activations(need_hessian=False)
        packed, qmeta = pack_model(
            self.params,
            method,
            mcfg,
            self.stats if needs_stats else None,
            arch=self.model_cfg.arch,
        )
        save_quantized(
            out_dir,
            packed,
            qmeta,
            {"method": method, "model": self.config["model_name"], **mcfg},
        )
        self.log(f"Packed {method} artifact saved to {out_dir}")

    def save_results(self, output_path: str = "benchmark_results.json"):
        results_dict = {
            "timestamp": datetime.now().isoformat(),
            "config": self.config,
            "environment": {
                "backend": jax.default_backend(),
                "devices": [str(d) for d in jax.devices()],
                "jax_version": jax.__version__,
            },
            "results": {k: v.to_dict() for k, v in self.results.items()},
        }
        with open(output_path, "w") as f:
            json.dump(results_dict, f, indent=2)
        self.log(f"\nResults saved to {output_path}")
