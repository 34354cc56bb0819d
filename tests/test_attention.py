"""Attention kernel tests: einsum vs torch SDPA oracle; flash vs einsum."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from e4t_diffusion_tpu.ops.attention import (
    einsum_attention,
    flash_attention,
    dot_product_attention,
)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("sq,sk,d", [(64, 64, 40), (77, 77, 64), (128, 77, 80)])
def test_einsum_matches_torch_sdpa(sq, sk, d):
    q, k, v = _rand((2, 4, sq, d), 0), _rand((2, 4, sk, d), 1), _rand((2, 4, sk, d), 2)
    ours = einsum_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=2e-5)


def test_einsum_causal_matches_torch():
    q, k, v = _rand((1, 2, 77, 64), 0), _rand((1, 2, 77, 64), 1), _rand((1, 2, 77, 64), 2)
    ours = einsum_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "sq,sk,d",
    [
        (256, 256, 40),   # UNet self-attention shape (head dim padded 40->128)
        (256, 77, 160),   # UNet cross-attention: kv = 77 text tokens
        (384, 384, 80),   # ViT-ish, uneven q blocks
        (257, 257, 80),   # ViT-H token count (padding on both axes)
    ],
)
def test_flash_matches_einsum(sq, sk, d):
    q, k, v = _rand((1, 2, sq, d), 3), _rand((1, 2, sk, d), 4), _rand((1, 2, sk, d), 5)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    ref = einsum_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_einsum():
    q, k, v = (jnp.asarray(_rand((1, 2, 128, 64), s)) for s in (6, 7, 8))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = einsum_attention(q, k, v)
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_flash_gradients_blocked_fallback(monkeypatch):
    """Force the (bh, nq, nk)-grid blocked backward (the non-resident
    path used when tensors exceed the VMEM residency bounds)."""
    from e4t_diffusion_tpu.ops import attention as A

    monkeypatch.setattr(A, "_KVRES_MAX_ELEMS", 0)
    monkeypatch.setattr(A, "_QRES_MAX_ELEMS", 0)
    q, k, v = (jnp.asarray(_rand((1, 2, 256, 64), s)) for s in (9, 10, 11))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = einsum_attention(q, k, v)
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_gradients_resident_uneven_kv(monkeypatch):
    """Resident backward with kv padding (kv_len % block_k != 0)."""
    q, k, v = (jnp.asarray(_rand((1, 2, 128, 64), s)) for s in (12, 13, 14))
    k = k[:, :, :77]
    v = v[:, :, :77]

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = einsum_attention(q, k, v)
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_lowdim_route_selected(monkeypatch):
    """head_dim below the lane tile routes through the transposed-
    accumulator kernel; full-tile head_dim uses the standard kernel."""
    from e4t_diffusion_tpu.ops import attention as A

    calls = []
    real = A._flash_attention_lowdim_padded
    monkeypatch.setattr(A, "_flash_attention_lowdim_padded",
                        lambda *a, **k: calls.append("lowdim") or real(*a, **k))
    q40 = jnp.asarray(_rand((1, 2, 128, 40)))
    A.flash_attention(q40, q40, q40, block_q=128, block_k=128)
    assert calls == ["lowdim"]
    calls.clear()
    q128 = jnp.asarray(_rand((1, 2, 128, 128)))
    A.flash_attention(q128, q128, q128, block_q=128, block_k=128)
    assert calls == []


def test_dispatcher_cpu_falls_back():
    q = jnp.asarray(_rand((1, 1, 16, 8)))
    out = dot_product_attention(q, q, q)
    assert out.shape == q.shape


def test_dispatcher_threshold_routing(monkeypatch):
    """Below the score-bytes threshold -> einsum; above -> flash."""
    import e4t_diffusion_tpu.ops.attention as att

    calls = {}
    monkeypatch.setattr(att, "flash_attention",
                        lambda *a, **k: calls.setdefault("flash", True) or a[0])
    monkeypatch.setattr(att, "einsum_attention",
                        lambda *a, **k: calls.setdefault("einsum", True) or a[0])
    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    q = jnp.zeros((1, 1, 256, 64))
    monkeypatch.setattr(att, "_FLASH_SCORE_BYTES", 10**18)
    att.dot_product_attention(q, q, q)
    assert calls == {"einsum": True}
    calls.clear()
    monkeypatch.setattr(att, "_FLASH_SCORE_BYTES", 0)
    att.dot_product_attention(q, q, q)
    assert calls == {"flash": True}


# ---------------------------------------------------------------------------
# int8 flash attention (serving-only; ops/attention.int8_flash_attention)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sq,sk,d,mode,bound", [
    (256, 256, 40, "qk", 0.03),     # tiny stand-in for the 4096/d40 site
    (256, 200, 40, "qk", 0.03),     # kv-padding edge (200 % 128 != 0)
    (128, 128, 80, "qk", 0.03),     # the 1024/d80 site's head_dim
    (256, 256, 40, "qkpv", 0.05),   # p@v on the int8 MXU too
    (256, 200, 40, "qkpv", 0.05),
])
def test_int8_flash_matches_einsum(sq, sk, d, mode, bound):
    """Per-call int8-attention error vs the f32 einsum oracle. Measured
    interpret-mode rel-L2 is ~0.013 (qk) / ~0.022 (qkpv); the bounds
    leave ~2x headroom for seed/tile variation."""
    from e4t_diffusion_tpu.ops import attention as A

    q = jnp.asarray(_rand((2, 3, sq, d), 10))
    # nonzero channel mean on k: the realistic regime (transformer keys
    # have dominant per-channel means) and what the mean-centering in
    # _int8_lowdim_path exists for
    k = jnp.asarray(_rand((2, 3, sk, d), 11)) + 0.7
    v = jnp.asarray(_rand((2, 3, sk, d), 12))
    ref = A.einsum_attention(q, k, v)
    with A.int8_flash_attention(mode):
        out = A.flash_attention(q, k, v, block_q=128, block_k=128)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < bound, rel


def test_int8_flash_k_centering_handles_large_means():
    """A key tensor whose channel means dwarf its variation would lose
    nearly all int8 resolution without centering; with centering the
    error must stay at the centered-regime level."""
    from e4t_diffusion_tpu.ops import attention as A

    q = jnp.asarray(_rand((1, 2, 128, 40), 20))
    k = jnp.asarray(_rand((1, 2, 128, 40), 21)) * 0.1 + 5.0
    v = jnp.asarray(_rand((1, 2, 128, 40), 22))
    ref = A.einsum_attention(q, k, v)
    with A.int8_flash_attention("qk"):
        out = A.flash_attention(q, k, v, block_q=128, block_k=128)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_int8_flash_context_leaves_einsum_path_alone():
    """dot_product_attention below the flash threshold (cross-attention,
    small sites) must stay full-precision under the int8 context."""
    from e4t_diffusion_tpu.ops import attention as A

    q = jnp.asarray(_rand((1, 2, 64, 40), 30))
    k = jnp.asarray(_rand((1, 2, 77, 40), 31))
    v = jnp.asarray(_rand((1, 2, 77, 40), 32))
    ref = dot_product_attention(q, k, v)
    with A.int8_flash_attention("qk"):
        out = dot_product_attention(q, k, v)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_int8_flash_context_is_scoped():
    from e4t_diffusion_tpu.ops import attention as A

    assert not A._INT8_FLASH_CTX
    with A.int8_flash_attention("qkpv"):
        assert A._INT8_FLASH_CTX == ["qkpv"]
    assert not A._INT8_FLASH_CTX
    with pytest.raises(AssertionError):
        with A.int8_flash_attention("bogus"):
            pass


def test_int8_flash_inside_scan_jit():
    """The serving pipeline traces attention inside a jitted lax.scan;
    the int8 path (quantization + SMEM-scales kernel) must compose."""
    from e4t_diffusion_tpu.ops import attention as A

    q = jnp.asarray(_rand((3, 1, 2, 128, 40), 40))
    k = jnp.asarray(_rand((3, 1, 2, 128, 40), 41))
    v = jnp.asarray(_rand((3, 1, 2, 128, 40), 42))

    with A.int8_flash_attention("qkpv"):
        @jax.jit
        def scanned(qs, ks, vs):
            def body(c, x):
                out = A.flash_attention(*x, block_q=128, block_k=128)
                return c + jnp.sum(out), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), (qs, ks, vs))
            return tot
        got = float(scanned(q, k, v))

    want = sum(float(jnp.sum(A.einsum_attention(q[i], k[i], v[i])))
               for i in range(3))
    assert abs(got - want) / abs(want) < 0.05


def test_lowdim_route_covers_highres_sequences(monkeypatch):
    """The residency bound budgets k/v at their true d_sub footprint, so
    768px (9216-token) and 1024px (16384-token) d=40 self-attention stay
    on the fast transposed-accumulator kernel (route check only: the
    kernel itself is exercised at real size on TPU,
    scripts/bench_attention.py hi-res shapes)."""
    from e4t_diffusion_tpu.ops import attention as A

    calls = []
    monkeypatch.setattr(
        A, "_flash_attention_lowdim_padded",
        lambda q, *a, **k: calls.append("lowdim") or q)
    monkeypatch.setattr(
        A, "_flash_attention_padded",
        lambda q, *a, **k: calls.append("standard") or q)
    for sk in (9216, 16384):
        calls.clear()
        q = jnp.zeros((1, 1, sk, 40))
        A.flash_attention(q, q, q, block_q=2048, block_k=512)
        assert calls == ["lowdim"], (sk, calls)
    # d=120 at 16384 tokens exceeds the VMEM budget -> standard path
    calls.clear()
    q = jnp.zeros((1, 1, 16384, 120))
    A.flash_attention(q, q, q, block_q=2048, block_k=512)
    assert calls == ["standard"]


# ---- packed-heads short-sequence kernel (round 5) ------------------------

def _shortseq_case(bh=8, s=257, d=80):
    q = jnp.asarray(_rand((2, bh // 2, s, d), 30))
    k = jnp.asarray(_rand((2, bh // 2, s, d), 31))
    v = jnp.asarray(_rand((2, bh // 2, s, d), 32))
    return q, k, v


@pytest.mark.parametrize("s,d,g", [(257, 80, 4), (257, 80, 16),
                                   (129, 40, 2), (384, 72, 8)])
def test_shortseq_mh_matches_einsum(monkeypatch, s, d, g):
    import e4t_diffusion_tpu.ops.attention as att

    monkeypatch.setattr(att, "_SHORTSEQ_MH_G", g)
    q, k, v = _shortseq_case(8, s, d)
    ref = einsum_attention(q, k, v)
    out = att.shortseq_mh_attention(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_shortseq_mh_gradients_match_einsum(monkeypatch):
    import e4t_diffusion_tpu.ops.attention as att

    monkeypatch.setattr(att, "_SHORTSEQ_MH_G", 4)
    q, k, v = _shortseq_case(4, 130, 40)
    scale = 1.0 / np.sqrt(40)

    def loss_mh(q, k, v):
        return jnp.sum(jnp.sin(att.shortseq_mh_attention(q, k, v, scale)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(einsum_attention(q, k, v, scale=scale)))

    g_mh = jax.grad(loss_mh, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_mh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_shortseq_mh_route_gating(monkeypatch):
    """The route only fires for short low-head-dim self-attention on TPU,
    and stays OFF by default elsewhere (cached serving programs must not
    retrace when the knob is absent)."""
    import e4t_diffusion_tpu.ops.attention as att

    q, k, _ = _shortseq_case(8, 257, 80)
    # default (0): disabled everywhere
    monkeypatch.setattr(att, "_SHORTSEQ_MH_G", 0)
    assert not att._use_shortseq_mh(q, k, None, False)
    monkeypatch.setattr(att, "_SHORTSEQ_MH_G", 16)
    # on a TPU backend this shape qualifies; the gate is backend-aware
    expected = jax.default_backend() == "tpu"
    assert att._use_shortseq_mh(q, k, None, False) is expected
    # cross-attention (sq != sk), causal, long-seq, high-d all excluded
    kv77 = jnp.zeros((2, 4, 77, 80))
    assert not att._use_shortseq_mh(q, kv77, None, False)
    assert not att._use_shortseq_mh(q, k, None, True)
    long = jnp.zeros((2, 4, 4096, 80))
    assert not att._use_shortseq_mh(long, long, None, False)
    wide = jnp.zeros((2, 4, 257, 128))
    assert not att._use_shortseq_mh(wide, wide, None, False)
