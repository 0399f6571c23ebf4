"""Serving tests: KV-cache correctness (bf16 + int8), cached decode parity
with the full forward, sampling, and the continuous batcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from qtpu.models import TINY_TEST, forward, init_params
from qtpu.quant.apply import pack_model
from qtpu.serve import ContinuousBatcher, init_cache
from qtpu.serve.decode import decode_step, greedy_generate, prefill, sample_token
from qtpu.serve.kvcache import dequantize_kv, quantize_kv


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _greedy_reference(params, cfg, prompt, n):
    """Teacher-forced greedy continuation via the full (cacheless) forward —
    the ground truth the cached path must reproduce."""
    ids = list(np.asarray(prompt).reshape(-1))
    out = []
    for _ in range(n):
        logits = forward(params, jnp.asarray([ids]), cfg)
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
        ids.append(tok)
    return out


def test_kv_quantize_roundtrip(rng):
    x = jax.random.normal(rng, (4, 16, 2, 64))
    q, s = quantize_kv(x)
    back = dequantize_kv(q, s, jnp.float32)
    err = float(jnp.abs(back - x).max() / jnp.abs(x).max())
    assert err < 0.02
    assert q.dtype == jnp.int8


def test_cached_prefill_matches_forward(setup):
    """Prefill logits at the last position == full forward's last position."""
    cfg, params = setup
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    full = forward(params, ids, cfg)
    cache = init_cache(cfg, 2, 64)
    last, cache = prefill(params, ids, cache, cfg)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(full[:, -1, :]), rtol=2e-2, atol=2e-2
    )
    assert int(cache.length[0]) == 16


def test_greedy_generate_matches_cacheless(setup):
    cfg, params = setup
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, cfg.vocab_size)
    expect = _greedy_reference(params, cfg, prompt, 6)
    cache = init_cache(cfg, 1, 64)
    toks, _ = greedy_generate(params, prompt, cache, cfg, n_tokens=6)
    got = list(np.asarray(toks[0]))
    assert got == expect


def test_int8_kv_cache_close_to_bf16(setup):
    """INT8 KV generations should rarely diverge from bf16 on a short
    horizon; logits of the first decode step must be close."""
    cfg, params = setup
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, cfg.vocab_size)
    c16 = init_cache(cfg, 2, 64)
    c8 = init_cache(cfg, 2, 64, quantized=True)
    l16, c16 = prefill(params, prompt, c16, cfg)
    l8, c8 = prefill(params, prompt, c8, cfg)
    rel = float(
        jnp.abs(l8 - l16).max() / jnp.clip(jnp.abs(l16).max(), 1e-6, None)
    )
    assert rel < 0.1
    assert c8.k.dtype == jnp.int8


def test_decode_step_positions(setup):
    """Per-sequence positions: two sequences at different offsets decode
    independently and update lengths correctly."""
    cfg, params = setup
    cache = init_cache(cfg, 2, 64)
    p1 = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0, cfg.vocab_size)
    _, cache = prefill(params, p1, cache, cfg)
    tok = jnp.array([3, 7], jnp.int32)
    pos = jnp.array([8, 8], jnp.int32)
    logits, cache = decode_step(params, tok, pos, cache, cfg)
    assert logits.shape == (2, cfg.vocab_size)
    assert list(np.asarray(cache.length)) == [9, 9]


def test_sampling_modes(rng):
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 100)), jnp.float32)
    g = sample_token(logits, rng, temperature=0.0)
    assert list(np.asarray(g)) == list(np.asarray(jnp.argmax(logits, -1)))
    t = sample_token(logits, rng, temperature=1.0, top_k=10)
    assert t.shape == (4,)
    p = sample_token(logits, rng, temperature=0.8, top_p=0.9)
    assert p.shape == (4,)


def test_packed_generate(setup):
    """Generation through the packed-W4 path produces valid tokens."""
    cfg, params = setup
    packed, qmeta = pack_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    prompt = jax.random.randint(jax.random.PRNGKey(6), (1, 8), 0, cfg.vocab_size)
    cache = init_cache(cfg, 1, 64)
    toks, _ = greedy_generate(packed, prompt, cache, cfg, n_tokens=4, qmeta=qmeta)
    assert toks.shape == (1, 4)
    assert bool(jnp.all((toks >= 0) & (toks < cfg.vocab_size)))


def test_codebook_packed_generate(setup):
    """Generation through the POT codebook-packed path (codebook LUT
    matmul) produces valid tokens."""
    cfg, params = setup
    packed, qmeta = pack_model(
        params, "pot", {"w_bit": 4, "q_group_size": 64, "grid_step": 0.25}
    )
    prompt = jax.random.randint(jax.random.PRNGKey(7), (1, 8), 0, cfg.vocab_size)
    cache = init_cache(cfg, 1, 64)
    toks, _ = greedy_generate(packed, prompt, cache, cfg, n_tokens=4, qmeta=qmeta)
    assert toks.shape == (1, 4)
    assert bool(jnp.all((toks >= 0) & (toks < cfg.vocab_size)))


def test_continuous_batcher_matches_greedy(setup):
    """Batcher output for simultaneous greedy requests must equal the
    single-sequence cached greedy path."""
    cfg, params = setup
    prompts = [
        np.asarray(
            jax.random.randint(jax.random.PRNGKey(10 + i), (6 + i,), 0, cfg.vocab_size)
        )
        for i in range(3)
    ]
    expected = []
    for p in prompts:
        cache = init_cache(cfg, 1, 128)
        toks, _ = greedy_generate(params, jnp.asarray(p)[None], cache, cfg, n_tokens=5)
        expected.append(list(np.asarray(toks[0])))

    eng = ContinuousBatcher(params, cfg, max_batch=2, max_seq_len=128)
    reqs = [eng.submit(p, max_new_tokens=5) for p in prompts]
    done = eng.run()
    assert len(done) == 3
    for req, exp in zip(reqs, expected):
        assert req.done
        assert req.output == exp, (req.output, exp)


def test_batcher_staggered_admission(setup):
    """A request submitted mid-flight joins without corrupting others."""
    cfg, params = setup
    p1 = np.asarray([1, 2, 3, 4, 5, 6])
    p2 = np.asarray([7, 8, 9, 10])
    cache = init_cache(cfg, 1, 128)
    exp1, _ = greedy_generate(params, jnp.asarray(p1)[None], cache, cfg, n_tokens=6)
    cache = init_cache(cfg, 1, 128)
    exp2, _ = greedy_generate(params, jnp.asarray(p2)[None], cache, cfg, n_tokens=4)

    eng = ContinuousBatcher(params, cfg, max_batch=2, max_seq_len=128)
    r1 = eng.submit(p1, max_new_tokens=6)
    eng.step()  # r1 admitted + 1 decode
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=4)  # joins while r1 mid-flight
    eng.run()
    assert r1.output == list(np.asarray(exp1[0]))
    assert r2.output == list(np.asarray(exp2[0]))


def test_batcher_parallel_admission_chunked(setup):
    """Batched multi-request admission (prefill_parallel > 1) with mixed
    prompt lengths, some spanning multiple prefill chunks, at a larger
    max_batch — every request's greedy output must equal the
    single-sequence path (VERDICT r2 task #5)."""
    cfg, params = setup
    lens = [5, 40, 17, 33, 8, 23]
    prompts = [
        np.asarray(
            jax.random.randint(jax.random.PRNGKey(100 + i), (n,), 0, cfg.vocab_size)
        )
        for i, n in enumerate(lens)
    ]
    expected = []
    for p in prompts:
        cache = init_cache(cfg, 1, 256)
        toks, _ = greedy_generate(params, jnp.asarray(p)[None], cache, cfg, n_tokens=4)
        expected.append(list(np.asarray(toks[0])))

    eng = ContinuousBatcher(
        params, cfg, max_batch=16, max_seq_len=128,
        prefill_chunk=16, prefill_parallel=4,
    )
    reqs = [eng.submit(p, max_new_tokens=4) for p in prompts]
    eng.run()
    for req, exp in zip(reqs, expected):
        assert req.done
        assert req.output == exp, (req.output, exp)


def test_pallas_decode_attention_matches_xla(setup):
    """Interpret-mode parity of the int8-KV decode-attention kernel vs the
    XLA dequantize-then-attend path."""
    from qtpu.kernels import pallas_kv_attention as pk
    from qtpu.serve.kvcache import dequantize_kv, quantize_kv

    cfg, params = setup
    B, H, KV, hd, S = 2, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, KV, S, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, KV, S, hd))
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    pos = jnp.array([10, 25], jnp.int32)

    # interpret-mode kernel (first-class kwarg)
    out = pk.pallas_decode_attention(q, kq, vq, ks, vs, pos, interpret=True)

    # XLA reference
    K = dequantize_kv(kq, ks, jnp.float32)
    V = dequantize_kv(vq, vs, jnp.float32)
    rep = H // KV
    Kr = jnp.repeat(K, rep, axis=1)
    Vr = jnp.repeat(V, rep, axis=1)
    scores = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), Kr) / jnp.sqrt(
        float(hd)
    )
    s_idx = jnp.arange(S)[None, None, :]
    scores = jnp.where(s_idx <= pos[:, None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    expect = jnp.einsum("bhk,bhkd->bhd", p, Vr)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expect, np.float32), rtol=5e-2, atol=5e-2
    )




def test_pallas_flash_attention_matches_xla():
    """Interpret-mode parity of the causal flash-attention kernel."""
    import qtpu.kernels.pallas_flash_attention as mod

    B, H, S, hd = 2, 4, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, hd), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, hd), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, hd), jnp.float32)

    out = mod.pallas_flash_attention(q, k, v, interpret=True)

    scores = jnp.einsum("bhsd,bhtd->bhst", q, k) / jnp.sqrt(float(hd))
    causal = jnp.tril(jnp.ones((S, S), bool))
    scores = jnp.where(causal[None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    expect = jnp.einsum("bhst,bhtd->bhsd", p, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=2e-3, atol=2e-3
    )


def _interp_decode(mod=None, *args, mod_call=None):
    """Run a pallas-calling function with interpret=True patched in."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = _partial(orig, interpret=True)
        if mod_call is not None:
            return mod_call()
        return mod.pallas_decode_attention(*args)
    finally:
        pl.pallas_call = orig


def test_http_serving_frontend(setup):
    """HTTP API end-to-end: health + generate over a live server, result
    identical to the direct greedy path."""
    import json as _json
    import threading
    import urllib.request

    from qtpu.serve.http import ServingFrontend, make_server

    cfg, params = setup
    eng = ContinuousBatcher(params, cfg, max_batch=2, max_seq_len=128)
    frontend = ServingFrontend(eng)
    server = make_server(frontend, 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        prompt = [1, 2, 3, 4, 5, 6, 7, 8]
        body = _json.dumps({"prompt_ids": prompt, "max_new_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        assert len(out["tokens"]) == 4
        cache = init_cache(cfg, 1, 128)
        expect, _ = greedy_generate(
            params, jnp.asarray(prompt)[None], cache, cfg, n_tokens=4
        )
        assert out["tokens"] == list(int(x) for x in np.asarray(expect[0]))

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30
        ) as r:
            h = _json.loads(r.read())
        assert h["status"] == "ok" and h["requests"] == 1

        # bad request → 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        frontend.shutdown()


def test_per_layer_cache_matches_stacked():
    """Per-layer-tuple KV cache (the decode-latency format) must match the
    stacked cache numerically through prefill + teacher-forced decode
    steps (logits compared — greedy argmax can flip on fusion-order noise
    with random tiny-model weights, so tokens are not the right oracle)."""
    from qtpu.bench.synth import tiled_packed_llama
    from qtpu.models.config import TINY_TEST
    from qtpu.serve import init_cache
    from qtpu.serve.decode import decode_step, prefill

    cfg = TINY_TEST
    packed, qmeta = tiled_packed_llama(cfg, 4, 64)
    B, P, N = 2, 16, 4
    prompt = jax.random.randint(jax.random.PRNGKey(0), (B, P), 0, cfg.vocab_size)
    forced = jax.random.randint(jax.random.PRNGKey(1), (N, B), 0, cfg.vocab_size)

    outs = {}
    for per_layer in (False, True):
        cache = init_cache(cfg, B, 64, quantized=True, per_layer=per_layer)
        assert cache.per_layer == per_layer
        logits, cache = prefill(packed, prompt, cache, cfg, qmeta)
        seq = [np.asarray(logits)]
        pos = jnp.full((B,), P, jnp.int32)
        for i in range(N):
            logits, cache = decode_step(packed, forced[i], pos, cache, cfg, qmeta)
            seq.append(np.asarray(logits))
            pos = pos + 1
        outs[per_layer] = seq
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def test_batcher_per_layer_layout():
    """ContinuousBatcher with kv_layout='per_layer' runs end-to-end and
    produces the right request/token accounting."""
    from qtpu.bench.synth import tiled_packed_llama
    from qtpu.models.config import TINY_TEST
    from qtpu.serve.batching import ContinuousBatcher

    cfg = TINY_TEST
    packed, qmeta = tiled_packed_llama(cfg, 4, 64)
    prompts = [
        np.random.default_rng(i).integers(0, cfg.vocab_size, (8 + 3 * i,))
        for i in range(3)
    ]
    eng = ContinuousBatcher(
        packed, cfg, qmeta=qmeta, max_batch=2, max_seq_len=128,
        kv_dtype="int8", decode_block=4, kv_layout="per_layer",
    )
    assert eng.cache.per_layer
    reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
    done = eng.run()
    assert len(done) == 3
    for r in reqs:
        assert r.done and len(r.output) == 6
        assert all(0 <= t < cfg.vocab_size for t in r.output)


def test_batcher_warmup_identical_outputs(setup):
    """warmup() pre-builds the program zoo on a scratch cache without
    touching the live cache or RNG stream: a warmed engine's outputs must
    be bit-identical to a cold engine's on the same workload."""
    cfg, params = setup
    prompts = [
        np.asarray(
            jax.random.randint(
                jax.random.PRNGKey(30 + i), (6 + i,), 0, cfg.vocab_size
            )
        )
        for i in range(3)
    ]

    def run(warm):
        eng = ContinuousBatcher(params, cfg, max_batch=2, max_seq_len=128)
        if warm:
            dt = eng.warmup()
            assert dt > 0.0
        reqs = [eng.submit(p, max_new_tokens=5) for p in prompts]
        eng.run()
        return [r.output for r in reqs]

    assert run(False) == run(True)
