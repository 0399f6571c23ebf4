"""Cross-framework parity: qtpu's Llama forward + perplexity math vs an
independent torch reimplementation of the reference's evaluation pipeline
(quantization_utils.py:269-322 semantics re-derived in torch, NOT imported).

This is the strongest offline check that "switching from the reference to
qtpu" preserves numbers: same weights → same logits → same perplexity, and
same RTN quantization → same quantized perplexity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

from qtpu.eval import evaluate_perplexity
from qtpu.models import TINY_TEST, forward, init_params
from qtpu.quant import pseudo_quantize, quantize_model


class TorchTinyLlama(torch.nn.Module):
    """Minimal torch Llama matching qtpu.models.llama semantics."""

    def __init__(self, cfg, params):
        super().__init__()
        self.cfg = cfg

        def t(a):
            return torch.tensor(np.asarray(a, np.float32))

        self.embed = t(params["embed"])
        L = cfg.num_layers
        lp = params["layers"]
        self.layers = []
        for l in range(L):
            self.layers.append(
                {
                    "attn_norm": t(lp["attn_norm"][l]),
                    "mlp_norm": t(lp["mlp_norm"][l]),
                    **{
                        s: t(lp[s]["w"][l])
                        for s in (
                            "q_proj",
                            "k_proj",
                            "v_proj",
                            "o_proj",
                            "gate_proj",
                            "up_proj",
                            "down_proj",
                        )
                    },
                }
            )
        self.final_norm = t(params["final_norm"])
        self.lm_head = t(params["lm_head"]["w"])

    @staticmethod
    def _rms(x, w, eps):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + eps) * w

    def _rope(self, x, pos):
        hd = self.cfg.head_dim
        inv = 1.0 / (
            self.cfg.rope_theta
            ** (torch.arange(0, hd, 2, dtype=torch.float32) / hd)
        )
        ang = pos[:, None].float() * inv[None, :]
        emb = torch.cat([ang, ang], dim=-1)
        cos, sin = emb.cos(), emb.sin()
        half = hd // 2
        x1, x2 = x[..., :half], x[..., half:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos[None, :, None, :] + rot * sin[None, :, None, :]

    def forward(self, ids):
        cfg = self.cfg
        B, S = ids.shape
        x = self.embed[ids]
        pos = torch.arange(S)
        mask = torch.tril(torch.ones(S, S, dtype=torch.bool))
        for lp in self.layers:
            h = self._rms(x, lp["attn_norm"], cfg.norm_eps)
            q = (h @ lp["q_proj"]).view(B, S, cfg.num_heads, cfg.head_dim)
            k = (h @ lp["k_proj"]).view(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = (h @ lp["v_proj"]).view(B, S, cfg.num_kv_heads, cfg.head_dim)
            q, k = self._rope(q, pos), self._rope(k, pos)
            rep = cfg.num_heads // cfg.num_kv_heads
            k = k.repeat_interleave(rep, dim=2)
            v = v.repeat_interleave(rep, dim=2)
            att = torch.einsum("bshd,bthd->bhst", q, k) / (cfg.head_dim**0.5)
            att = att.masked_fill(~mask[None, None], float("-inf"))
            p = att.softmax(-1)
            o = torch.einsum("bhst,bthd->bshd", p, v).reshape(B, S, -1)
            x = x + o @ lp["o_proj"]
            h = self._rms(x, lp["mlp_norm"], cfg.norm_eps)
            gate = h @ lp["gate_proj"]
            up = h @ lp["up_proj"]
            x = x + (torch.nn.functional.silu(gate) * up) @ lp["down_proj"]
        x = self._rms(x, self.final_norm, self.cfg.norm_eps)
        return x @ self.lm_head


def _torch_reference_ppl(model, test_ids, n_samples, block_size):
    """The reference's exact perplexity loop re-derived in torch
    (quantization_utils.py:302-321)."""
    nlls = []
    ids = torch.tensor(test_ids)
    with torch.no_grad():
        for i in range(n_samples):
            batch = ids[:, i * block_size : (i + 1) * block_size]
            logits = model(batch)
            shift_logits = logits[:, :-1, :].contiguous().float()
            shift_labels = batch[:, 1:]
            loss = torch.nn.functional.cross_entropy(
                shift_logits.view(-1, shift_logits.size(-1)),
                shift_labels.reshape(-1),
            )
            nlls.append(loss.float() * block_size)
    return float(torch.exp(torch.stack(nlls).sum() / (n_samples * block_size)))


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    test_ids = rng.integers(0, cfg.vocab_size, (1, 4 * 128), dtype=np.int64)
    return cfg, params, test_ids


def test_logits_parity(setup):
    cfg, params, test_ids = setup
    tm = TorchTinyLlama(cfg, params)
    ids = test_ids[:, :64]
    with torch.no_grad():
        lt = tm(torch.tensor(ids)).numpy()
    lj = np.asarray(forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(lj, lt, rtol=5e-3, atol=5e-3)


def test_perplexity_parity_fp(setup):
    cfg, params, test_ids = setup
    tm = TorchTinyLlama(cfg, params)
    ppl_t = _torch_reference_ppl(tm, test_ids, n_samples=4, block_size=128)
    ppl_j = evaluate_perplexity(
        params, test_ids.astype(np.int32), cfg, n_samples=4, block_size=128
    )
    assert abs(ppl_j - ppl_t) / ppl_t < 0.01, (ppl_j, ppl_t)


def test_perplexity_parity_quantized(setup):
    """RTN-quantize in qtpu, evaluate both frameworks on the SAME quantized
    weights → same perplexity. Proves quantize+eval end-to-end parity."""
    cfg, params, test_ids = setup
    qp = quantize_model(params, "rtn", {"w_bit": 4, "q_group_size": 64})
    tm = TorchTinyLlama(cfg, qp)
    ppl_t = _torch_reference_ppl(tm, test_ids, n_samples=4, block_size=128)
    ppl_j = evaluate_perplexity(
        qp, test_ids.astype(np.int32), cfg, n_samples=4, block_size=128
    )
    assert abs(ppl_j - ppl_t) / ppl_t < 0.01, (ppl_j, ppl_t)


def test_rtn_matches_torch_reference_math(setup):
    """pseudo_quantize vs the reference RTN re-derived in torch."""
    _, params, _ = setup
    w = np.asarray(params["layers"]["q_proj"]["w"][0].T, np.float32)  # [out,in]
    wt = torch.tensor(w)
    gw = wt.reshape(-1, 64)
    mx, mn = gw.amax(1, keepdim=True), gw.amin(1, keepdim=True)
    sc = (mx - mn).clamp(min=1e-5) / 15
    z = (-torch.round(mn / sc)).clamp_(0, 15)
    expect = ((torch.clamp(torch.round(gw / sc) + z, 0, 15) - z) * sc).reshape(
        wt.shape
    )
    got = np.asarray(pseudo_quantize(jnp.asarray(w), 4, 64))
    np.testing.assert_allclose(got, expect.numpy(), atol=1e-6)
