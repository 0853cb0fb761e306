import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vast_tpu.ops.attention import multi_head_attention, reference_attention
from vast_tpu.ops.fbank import kaldi_fbank, mel_banks
from vast_tpu.ops.flash_attention import flash_attention
from vast_tpu.ops.image import center_crop_resize, normalize_image, preprocess_frames
from vast_tpu.ops.masking import IGNORE_LABEL, mask_tokens


# ---------------- flash attention ----------------

@pytest.mark.parametrize("b,h,lq,lk,d", [(2, 4, 128, 128, 128),
                                          (1, 2, 256, 384, 128)])
def test_flash_attention_matches_reference(b, h, lq, lk, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, lk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, lk, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_with_bias_and_padding_mask():
    b, h, lq, lk, d = 2, 2, 128, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, lk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, lk, d), jnp.float32)
    bias = jax.random.normal(ks[3], (b, h, lq, lk), jnp.float32)
    # mask out the last 100 kv positions of batch 0
    bias = bias.at[0, :, :, -100:].set(-1e30)
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mha_wrapper_pads_odd_shapes():
    """88-dim heads (EVA01-g head_width) and non-multiple lengths."""
    b, l, h, d = 2, 257, 4, 88
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, l, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, l, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, l, h, d), jnp.float32)
    out_pallas = multi_head_attention(q, k, v, impl="pallas", interpret=True)
    out_ref = multi_head_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_mha_boolean_mask():
    b, l, h, d = 2, 16, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, l, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, l, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, l, h, d), jnp.float32)
    mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
    out = multi_head_attention(q, k, v, mask=mask, impl="xla")
    # causal: position 0 attends only to itself
    expect0 = v[:, 0]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(expect0),
                               atol=1e-5, rtol=1e-5)


# ---------------- fbank ----------------

def test_fbank_shapes_and_framing():
    wav = jnp.asarray(np.random.RandomState(0).randn(16000).astype(np.float32))
    fb = kaldi_fbank(wav * 2 ** 15)
    # snip_edges: 1 + (16000 - 400)//160 = 98 frames
    assert fb.shape == (98, 128)
    assert np.isfinite(np.asarray(fb)).all()


def test_fbank_dc_offset_invariance():
    rs = np.random.RandomState(1)
    wav = rs.randn(8000).astype(np.float32)
    a = kaldi_fbank(jnp.asarray(wav))
    b = kaldi_fbank(jnp.asarray(wav + 3.0))  # constant offset removed per frame
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_fbank_tone_peak_bin():
    """A pure 1 kHz tone must peak in the mel bin containing 1 kHz."""
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t) * 2 ** 15
    fb = np.asarray(kaldi_fbank(jnp.asarray(tone), num_mel_bins=40))
    peak_bin = fb.mean(axis=0).argmax()
    banks = mel_banks(40, 512, sr)
    # frequency of each fft bin
    freqs = np.arange(256) * sr / 512
    center_freq = freqs[banks[:, peak_bin].argmax()]
    assert abs(center_freq - 1000.0) < 150.0


def test_fbank_batched():
    wav = jnp.asarray(np.random.RandomState(2).randn(3, 8000).astype(np.float32))
    fb = kaldi_fbank(wav)
    assert fb.shape == (3, 48, 128)


# ---------------- image ----------------

def test_preprocess_frames_resize_normalize():
    x = (np.random.RandomState(0).rand(2, 3, 64, 48, 3) * 255).astype(np.uint8)
    out = preprocess_frames(jnp.asarray(x), 32)
    assert out.shape == (2, 3, 32, 32, 3)
    # normalization: uniform [0,255] -> roughly centered
    assert abs(float(out.mean())) < 2.0


def test_center_crop_resize():
    x = jnp.ones((1, 2, 100, 60, 3))
    out = center_crop_resize(x, 48)
    assert out.shape == (1, 2, 48, 48, 3)


def test_train_crop_flip_runs():
    x = (np.random.RandomState(1).rand(2, 2, 64, 64, 3)).astype(np.float32)
    out = preprocess_frames(jnp.asarray((x * 255).astype(np.uint8)), 32,
                            train=True, rng=jax.random.PRNGKey(0),
                            transforms="crop_flip")
    assert out.shape == (2, 2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------- token masking ----------------

def test_mask_tokens_semantics():
    tok = np.zeros((4, 12), np.int32)
    tok[:, 0] = 101
    tok[:, 1:6] = np.arange(200, 205)
    tok[:, 6] = 102
    tokens = jnp.asarray(tok)
    corrupted, labels = mask_tokens(jax.random.PRNGKey(0), tokens, 0.6,
                                    mask_token=103)
    corrupted, labels = np.asarray(corrupted), np.asarray(labels)
    # CLS and pads never masked
    assert (labels[:, 0] == IGNORE_LABEL).all()
    assert (labels[:, 7:] == IGNORE_LABEL).all()
    assert (corrupted[:, 7:] == 0).all()
    # at least one masked per row
    assert ((labels != IGNORE_LABEL).sum(axis=1) >= 1).all()
    # labels hold original tokens where set
    sel = labels != IGNORE_LABEL
    np.testing.assert_array_equal(labels[sel], tok[sel])


def test_mask_tokens_rates():
    rs = np.random.RandomState(0)
    tok = rs.randint(200, 300, (64, 40)).astype(np.int32)
    tok[:, 0] = 101
    corrupted, labels = mask_tokens(jax.random.PRNGKey(1), jnp.asarray(tok),
                                    0.6, mask_token=103, range_start=106,
                                    range_end=30522)
    corrupted, labels = np.asarray(corrupted), np.asarray(labels)
    sel = labels != IGNORE_LABEL
    frac_sel = sel.mean()
    assert 0.5 < frac_sel < 0.7
    masked = (corrupted == 103) & sel
    assert 0.7 < masked.sum() / sel.sum() < 0.9


def test_flash_attention_gradients_match_xla():
    """Pallas kernels are not auto-differentiable; the custom VJP must give
    the same gradients as the XLA path (training on TPU depends on this)."""
    b, l, h, d = 2, 130, 2, 40
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, l, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, l, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, l, h, d), jnp.float32)
    mask = jnp.ones((b, 1, l, l), bool).at[:, :, :, -7:].set(False)

    def loss(impl):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, mask=mask, impl=impl,
                                       interpret=True)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    g_pallas = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_flash_attention_bwd_learned_bias_grad():
    """Learned additive biases (BEATs gated rel-pos, Swin tables) need a
    real dbias: ds reduced over the bias's broadcast axes."""
    b, l, h, d = 2, 64, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (b, l, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, l, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, l, h, d), jnp.float32)
    # per-head bias shared across batch, like a rel-pos table
    bias = jax.random.normal(ks[3], (1, h, l, l), jnp.float32)

    def loss(impl):
        def f(q, k, v, bias):
            out = multi_head_attention(q, k, v, bias=bias, impl=impl,
                                       interpret=True)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    g_pallas = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_xla = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_flash_attention_bwd_no_bias_multiblock():
    """Multi-tile backward (several q and kv blocks) without bias."""
    from vast_tpu.ops.flash_attention import flash_attention_bwd

    b, h, lq, lk, d = 1, 2, 256, 384, 128
    ks = jax.random.split(jax.random.PRNGKey(8), 4)
    q = jax.random.normal(ks[0], (b, h, lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, lk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, lk, d), jnp.float32)
    g = jax.random.normal(ks[3], (b, h, lq, d), jnp.float32)

    out, lse = flash_attention(q, k, v, return_lse=True, interpret=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, None, out, lse, g,
                                     block_q=128, block_k=128,
                                     interpret=True)
    _, vjp = jax.vjp(lambda q, k, v: reference_attention(q, k, v), q, k, v)
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               atol=2e-4, rtol=1e-3)


def test_tmajor_vmem_gate():
    """The token-sliced backward block must fit VMEM at g=1; shapes that
    don't (EVA at 448px) must be rejected so the model routes to the
    head-major flash path instead of compile-crashing."""
    from vast_tpu.ops.flash_attention import tmajor_fits_vmem

    assert tmajor_fits_vmem(272, 128, 2)        # EVA-g 224px bf16
    assert not tmajor_fits_vmem(1040, 128, 2)   # EVA 448px: ~19 MB


def test_flash_attention_bwd_tiled_non128_lk():
    """AST-style shapes: bias-free Lk pads only to a 16-multiple while
    Lq > 512 forces the tiled backward, whose key tiles are 128-granular.
    Regression for the round-2 advisor finding: ``nk = lk // block_k``
    truncated and dk/dv rows past the last full 128-block were never
    written (AST training, 1214 tokens -> 64 lost key rows)."""
    b, l, h, d = 1, 611, 2, 64  # lq pads to 640 (128), lk to 624 (16)
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, l, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, l, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, l, h, d), jnp.float32)

    def loss(impl):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, impl=impl, interpret=True)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    g_pallas = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_flash_attention_fwd_lse_matches_reference():
    b, h, l, d = 1, 2, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, d), jnp.float32)
    out, lse = flash_attention(q, k, v, return_lse=True, interpret=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    ref_lse = jax.nn.logsumexp(s, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_lk_true_masks_tail():
    """Lk sublane-padded (16-mult) with in-kernel tail masking must equal
    the reference over the true keys, fwd and grads (the zero-glue EVA
    path and every no-bias wrapper call depend on this)."""
    b, h, lqp, lkp, d, l_true = 2, 2, 144, 144, 128, 130
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, h, lqp, d), jnp.float32)
    # garbage (not zeros) in the key/value tail — must not leak through
    k = jax.random.normal(ks[1], (b, h, lkp, d), jnp.float32) * 50
    v = jax.random.normal(ks[2], (b, h, lkp, d), jnp.float32) * 50
    out = flash_attention(q, k, v, interpret=True, lk_true=l_true)
    ref = reference_attention(q, k[:, :, :l_true], v[:, :, :l_true])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)

def test_eva_token_sliced_matches_plain_path():
    """The token-sliced EVA attention (fused plain-matmul qkv with baked
    scale/padding + lane-slice kernel) must reproduce the plain path.
    token_sliced is static per backend; force it and run the kernels in
    interpret mode."""
    import dataclasses as dc

    from tests.helpers import TINY_EVA
    from vast_tpu.models.eva_vit import EvaAttention
    from vast_tpu.models import eva_vit as ev

    cfg = dc.replace(TINY_EVA, width=64, head_width=24, layers=1)
    # 17 tokens -> lp 32; head 24 -> dp 128
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 64), jnp.float32)
    mod = EvaAttention(cfg)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    ref = mod.apply({"params": params}, x)

    orig = ev.jax.default_backend
    orig_ts = ev.flash_self_attention_tmajor
    ev.jax.default_backend = lambda: "tpu"
    try:
        # the problem is tiny, so bypass the l*l size gate via a config
        # with a 257-token grid, and run the kernel in interpret mode
        ev.flash_self_attention_tmajor = (
            lambda y, h, lk_true, scale: orig_ts(y, h, lk_true, scale, True))
        mod2 = EvaAttention(dc.replace(cfg, image_size=128, patch_size=8))
        # 16x16+1=257 patches passes the gate; attention is
        # length-agnostic, so the same 17-token x drives both paths
        out = mod2.apply({"params": params}, x)
    finally:
        ev.jax.default_backend = orig
        ev.flash_self_attention_tmajor = orig_ts
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_token_sliced_self_attention_grads_match_reference():
    """Fwd + VJP of the token-sliced kernel vs a naive fused-qkv reference
    (garbage in the key/value tail must not leak into values or grads)."""
    from vast_tpu.ops.attention import flash_self_attention_tmajor

    b, lp, h, dp, hd, l_true = 2, 32, 2, 128, 24, 27
    y = jax.random.normal(jax.random.PRNGKey(3), (b, lp, 3 * h * dp),
                          jnp.float32)

    def naive(y):
        qkv = y.reshape(b, lp, h, 3, dp)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        q = jnp.swapaxes(q, 1, 2)[:, :, :l_true]
        k = jnp.swapaxes(k, 1, 2)[:, :, :l_true]
        v = jnp.swapaxes(v, 1, 2)[:, :, :l_true]
        out = reference_attention(q, k, v)
        return jnp.swapaxes(out, 1, 2).reshape(b, l_true, h * dp)

    def loss_ts(y):
        out = flash_self_attention_tmajor(y, h, l_true, 1.0, True)
        return (out[:, :l_true].astype(jnp.float32) ** 2).sum()

    def loss_naive(y):
        return (naive(y).astype(jnp.float32) ** 2).sum()

    o_ts = flash_self_attention_tmajor(y, h, l_true, 1.0, True)
    np.testing.assert_allclose(np.asarray(o_ts[:, :l_true]),
                               np.asarray(naive(y)), atol=2e-5, rtol=2e-5)
    g_ts = jax.grad(loss_ts)(y)
    g_ref = jax.grad(loss_naive)(y)
    # grads are O(40) here; fp32 recompute vs autodiff accumulation
    # differences land at ~1e-5 relative
    np.testing.assert_allclose(np.asarray(g_ts), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-3)
    # padding-tail grads are exactly zero in both
    np.testing.assert_array_equal(
        np.asarray(g_ts).reshape(b, lp, h, 3, dp)[:, l_true:], 0.0)


@pytest.mark.slow  # 36 s of compile; the op-level biased-kernel parity
# (test_grouped_biased_token_sliced_matches_reference) stays in the tier
def test_beats_token_sliced_matches_hmajor_path():
    """BEATs attention through the token-sliced kernel with the gated
    rel-pos bias (fwd + param grads) must match the head-major fallback.
    The path choice is static per backend; force it and run the kernels
    in interpret mode."""
    from vast_tpu.models import beats as bt
    from vast_tpu.models.beats import BeatsAttention, BeatsConfig

    cfg = BeatsConfig(encoder_embed_dim=32, encoder_attention_heads=4,
                      num_buckets=16, max_distance=32, gru_rel_pos=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 32), jnp.float32)
    mod = BeatsAttention(cfg, has_relative_attention_bias=True)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]

    def loss(p, m):
        out, _ = m.apply({"params": p}, x)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    ref, _ = mod.apply({"params": params}, x)
    g_ref = jax.grad(loss)(params, mod)

    orig_backend = bt.jax.default_backend
    orig_plain = bt.flash_self_attention_tmajor
    orig_biased = bt.flash_self_attention_tmajor_biased
    bt.jax.default_backend = lambda: "tpu"
    bt.flash_self_attention_tmajor = (
        lambda y, h, lk, s: orig_plain(y, h, lk, s, True))
    bt.flash_self_attention_tmajor_biased = (
        lambda y, bias, h, lk, s: orig_biased(y, bias, h, lk, s, True))
    try:
        out, _ = mod.apply({"params": params}, x)
        g_ts = jax.grad(loss)(params, mod)
    finally:
        bt.jax.default_backend = orig_backend
        bt.flash_self_attention_tmajor = orig_plain
        bt.flash_self_attention_tmajor_biased = orig_biased

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4),
        g_ts, g_ref)


def test_grouped_unpadded_token_sliced_matches_reference():
    """hc>1 head-grouping (unpadded head width): h=4, dp=64 -> hc=2 —
    fwd + grads vs the naive reference, plus head_packing's fallback
    rule. The per-head q/k/v slices are cut in-VMEM at non-lane-aligned
    offsets; values and grads must be identical to the padded layout's."""
    from vast_tpu.ops.attention import flash_self_attention_tmajor
    from vast_tpu.ops.flash_attention import head_packing

    assert head_packing(88, 16) == 88       # EVA-g: hc=16 divides 16
    assert head_packing(64, 12) == 64       # BEATs: hc=2 divides 12
    assert head_packing(88, 8) == 128       # hc=16 doesn't divide 8
    assert head_packing(128, 7) == 128      # already aligned: hc=1

    b, lp, h, dp, l_true = 2, 32, 4, 64, 27
    y = jax.random.normal(jax.random.PRNGKey(5), (b, lp, 3 * h * dp),
                          jnp.float32)

    def naive(y):
        qkv = y.reshape(b, lp, h, 3, dp)
        q = jnp.swapaxes(qkv[:, :, :, 0], 1, 2)[:, :, :l_true]
        k = jnp.swapaxes(qkv[:, :, :, 1], 1, 2)[:, :, :l_true]
        v = jnp.swapaxes(qkv[:, :, :, 2], 1, 2)[:, :, :l_true]
        out = reference_attention(q, k, v)
        return jnp.swapaxes(out, 1, 2).reshape(b, l_true, h * dp)

    o_ts = flash_self_attention_tmajor(y, h, l_true, 1.0, True)
    np.testing.assert_allclose(np.asarray(o_ts[:, :l_true]),
                               np.asarray(naive(y)), atol=2e-5, rtol=2e-5)

    def loss_ts(y):
        out = flash_self_attention_tmajor(y, h, l_true, 1.0, True)
        return (out[:, :l_true].astype(jnp.float32) ** 2).sum()

    g_ts = jax.grad(loss_ts)(y)
    g_ref = jax.grad(lambda y: (naive(y) ** 2).sum())(y)
    np.testing.assert_allclose(np.asarray(g_ts), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(g_ts).reshape(b, lp, h, 3, dp)[:, l_true:], 0.0)


def test_grouped_biased_token_sliced_matches_reference():
    """hc=2 grouping with an additive score bias (the BEATs layout):
    fwd + dqkv + dbias vs the naive reference."""
    from vast_tpu.ops.attention import flash_self_attention_tmajor_biased

    b, lp, h, dp = 2, 128, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    y = jax.random.normal(ks[0], (b, lp, 3 * h * dp), jnp.float32)
    bias = jax.random.normal(ks[1], (b, h, lp, lp), jnp.float32)

    def naive(y, bias):
        qkv = y.reshape(b, lp, h, 3, dp)
        q = jnp.swapaxes(qkv[:, :, :, 0], 1, 2)
        k = jnp.swapaxes(qkv[:, :, :, 1], 1, 2)
        v = jnp.swapaxes(qkv[:, :, :, 2], 1, 2)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return jnp.swapaxes(out, 1, 2).reshape(b, lp, h * dp)

    o_ts = flash_self_attention_tmajor_biased(y, bias, h, 0, 1.0, True)
    np.testing.assert_allclose(np.asarray(o_ts), np.asarray(naive(y, bias)),
                               atol=3e-5, rtol=3e-5)

    def loss(fn):
        return lambda y, bias: (fn(y, bias).astype(jnp.float32) ** 2).sum()

    g_ts = jax.grad(loss(lambda y, b_: flash_self_attention_tmajor_biased(
        y, b_, h, 0, 1.0, True)), argnums=(0, 1))(y, bias)
    g_ref = jax.grad(loss(naive), argnums=(0, 1))(y, bias)
    for a, r in zip(g_ts, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)
