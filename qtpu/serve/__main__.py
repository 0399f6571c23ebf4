"""Serving demo CLI — drive the continuous-batching engine end-to-end.

Usage:
  python -m qtpu.serve [--model tiny-test] [--method rtn] [--w-bit 4]
                       [--kv int8|bfloat16] [--requests 4] [--tokens 16]
                       [--batch 4] [--temperature 0.0]

Generates from random prompts on a random-init model (no network egress
here); prints per-request token streams and aggregate tokens/s.
"""

import argparse
import sys
import time

import jax
import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m qtpu.serve", description=__doc__)
    ap.add_argument("--model", default="tiny-test")
    ap.add_argument(
        "--method",
        default="rtn",
        choices=["none", "rtn", "awq", "smoothquant", "gptq", "pot", "apot"],
    )
    ap.add_argument("--w-bit", type=int, default=4)
    ap.add_argument("--group", type=int, default=64)
    ap.add_argument("--kv", default="bfloat16", choices=["bfloat16", "int8"])
    ap.add_argument("--a8", action="store_true", help="W8A8: dynamic int8 activations (smoothquant only)")
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--http", type=int, default=0, metavar="PORT",
                    help="serve an HTTP API instead of the demo run")
    args = ap.parse_args(argv)

    from qtpu.models import get_arch, get_model_config
    from qtpu.serve import ContinuousBatcher

    cfg = get_model_config(args.model)
    arch = get_arch(cfg.arch)
    params = arch.init_params(cfg, jax.random.PRNGKey(args.seed))
    qmeta = None
    if args.method != "none":
        from qtpu.calib import collect_calibration_stats
        from qtpu.quant.apply import pack_model

        stats = None
        if args.method in ("awq", "smoothquant", "gptq"):
            batches = [
                np.random.default_rng(i).integers(
                    0, cfg.vocab_size, (1, 64), dtype=np.int32
                )
                for i in range(4)
            ]
            stats = collect_calibration_stats(arch.forward, params, batches, cfg)
        mcfg = {"w_bit": args.w_bit, "q_group_size": args.group}
        if args.a8:
            mcfg.update({"act_quant": True, "w_bit": 8})
        params, qmeta = pack_model(params, args.method, mcfg, stats, arch=cfg.arch)
        from qtpu.quant.apply import fold_smooth, fuse_packed_sites

        params, qmeta = fold_smooth(params, qmeta, arch=cfg.arch)
        params, qmeta = fuse_packed_sites(params, qmeta, arch=cfg.arch)
        print(f"packed model with {args.method} W{args.w_bit} g{args.group}")

    eng = ContinuousBatcher(
        params,
        cfg,
        qmeta=qmeta,
        max_batch=args.batch,
        max_seq_len=args.max_seq,
        kv_dtype=args.kv,
        seed=args.seed,
    )
    if args.http:
        from qtpu.serve.http import ServingFrontend, make_server

        # warm the program zoo before opening the port: with the disk
        # compilation cache populated this is seconds of deserialization,
        # and the first requests see warm-path TTFT (deploy restart)
        t_w = time.perf_counter()
        eng.warmup()
        print(f"engine warmup {time.perf_counter() - t_w:.1f}s")
        frontend = ServingFrontend(eng)
        server = make_server(frontend, args.http)
        print(f"serving on http://127.0.0.1:{server.server_address[1]} "
              "(POST /generate, GET /health)")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            frontend.shutdown()
        return 0
    rng = np.random.default_rng(args.seed)
    reqs = []
    for i in range(args.requests):
        prompt = rng.integers(0, cfg.vocab_size, size=8 + 2 * i, dtype=np.int32)
        reqs.append(
            eng.submit(prompt, max_new_tokens=args.tokens, temperature=args.temperature)
        )
    t0 = time.perf_counter()
    done = eng.run()
    total_tokens = sum(len(r.output) for r in done)
    dt = time.perf_counter() - t0
    for r in done:
        print(f"req {r.uid}: prompt[{len(r.prompt)}] -> {r.output}")
    print(
        f"{len(done)} requests, {total_tokens} tokens in {dt:.2f}s "
        f"({total_tokens / dt:.1f} tok/s incl. compile)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
