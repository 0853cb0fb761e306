import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import tiny_batch, tiny_vast_config
from vast_tpu.models.vast import VASTModel, label_smoothed_ce


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_vast_config()
    model = VASTModel(cfg)
    batch = tiny_batch(with_subtitle=True, with_qa=True)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(
        rngs, batch, "ret%tvas%tvs%tva%tv%ta_cap%tvas_qa%tvas",
        compute_loss=True,
        deterministic=True,
        step_rngs={"mask": jax.random.PRNGKey(2),
               "negatives": jax.random.PRNGKey(3)})
    return model, variables["params"]


def apply_model(model, params, batch, task, compute_loss=True, seed=0):
    return model.apply(
        {"params": params}, batch, task, compute_loss=compute_loss,
        deterministic=True,
        step_rngs={"mask": jax.random.PRNGKey(seed),
               "negatives": jax.random.PRNGKey(seed + 1)})


def test_ret_loss_finite(model_and_params):
    model, params = model_and_params
    batch = tiny_batch(with_subtitle=True)
    out = apply_model(model, params, batch, "ret%tvas%tv%ta")
    assert set(out) == {"loss_itc", "loss_itm"}
    for v in out.values():
        assert np.isfinite(float(v))
    # ITC on random features should be near ln(B) + smoothing effects
    assert 0.2 < float(out["loss_itc"]) < 5.0


def test_cap_and_qa_losses(model_and_params):
    model, params = model_and_params
    batch = tiny_batch(with_subtitle=True, with_qa=True)
    out = apply_model(model, params, batch, "cap%tva_qa%tv")
    assert set(out) == {"loss_cap", "loss_qa"}
    for v in out.values():
        assert np.isfinite(float(v)) and float(v) > 0


def test_eval_forward_returns_features(model_and_params):
    model, params = model_and_params
    batch = tiny_batch(with_subtitle=True)
    out = apply_model(model, params, batch, "ret%tvas%tv", compute_loss=False)
    assert out["feat_t"].shape == (4, 16)
    assert out["feat_cond_tvas"].shape == (4, 16)
    # condition feats: vision 2 frames * 17 tokens + audio 16 + subtitle 12
    assert out["condition_feats_tvas"].shape == (4, 2 * 17 + 16 + 12, 32)
    assert out["condition_feats_tv"].shape == (4, 34, 32)
    # normalized features
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["feat_t"]), axis=-1), 1.0, atol=1e-5)


def test_feature_dag_shares_encoder_passes(model_and_params):
    """tvas + tv + ta in one eval task must run each encoder exactly once.

    Direct evidence: the traced program contains exactly 3 convolutions —
    vision patch embed, BEATs patch embed, BEATs pos_conv — not one per
    subtask (the reference achieves this via the batch_get memo cache,
    model/vast.py:81; here via the dict cache under trace)."""
    model, params = model_and_params
    batch = tiny_batch(with_subtitle=True)

    def f_multi(p, b):
        return apply_model(model, p, b, "ret%tvas%tv%ta", compute_loss=False)

    jaxpr = str(jax.make_jaxpr(f_multi)(params, batch))
    assert jaxpr.count("conv_general_dilated") == 3, (
        jaxpr.count("conv_general_dilated"))


@pytest.mark.slow
def test_grads_flow_through_both_encoders(model_and_params):
    model, params = model_and_params
    batch = tiny_batch()

    def loss_fn(p):
        out = apply_model(model, p, batch, "ret%tva")
        return out["loss_itc"] + out["loss_itm"]

    g = jax.grad(loss_fn)(params)
    for enc in ["vision_encoder", "audio_encoder", "multimodal_encoder"]:
        leaves = jax.tree.leaves(g[enc])
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves), enc


def test_frozen_vision_stops_grads():
    cfg = tiny_vast_config(frozen_vision=True)
    model = VASTModel(cfg)
    batch = tiny_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, "ret%tv",
        compute_loss=True, deterministic=True,
        step_rngs={"negatives": jax.random.PRNGKey(3)})["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, batch, "ret%tv", compute_loss=True,
                          deterministic=True,
                          step_rngs={"negatives": jax.random.PRNGKey(3)})
        return out["loss_itc"]

    g = jax.grad(loss_fn)(params)
    assert all(float(jnp.abs(x).max()) == 0
               for x in jax.tree.leaves(g["vision_encoder"]))


def test_device_preprocessing_path():
    """Raw uint8 frames + waveform in, encoders run after on-device
    preprocessing (the north-star fused path)."""
    cfg = tiny_vast_config()
    model = VASTModel(cfg)
    rs = np.random.RandomState(0)
    batch = {
        "vision_frames": jnp.asarray(
            (rs.rand(2, 2, 48, 48, 3) * 255).astype(np.uint8)),
        "audio_waveforms": jnp.asarray(
            (rs.randn(2, 16000) * 2 ** 15).astype(np.float32)),
        "caption_tokens": jnp.asarray(
            rs.randint(106, 170, (2, 12)).astype(np.int32)),
        "caption_attention_mask": jnp.ones((2, 12), jnp.int32),
    }
    # 16000 samples -> 98 frames -> need (n=1) clip of 64 frames
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, "ret%tva",
        compute_loss=False, deterministic=True)["params"]
    out = model.apply({"params": params}, batch, "ret%tva",
                      compute_loss=False, deterministic=True)
    assert out["feat_cond_tva"].shape == (2, 16)
    assert np.isfinite(np.asarray(out["feat_cond_tva"])).all()


def test_label_smoothed_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    logits = rs.randn(6, 10).astype(np.float32)
    targets = rs.randint(0, 10, (6,))
    ours = float(label_smoothed_ce(jnp.asarray(logits), jnp.asarray(targets),
                                   0.1))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(targets), label_smoothing=0.1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_vast27m_pretrain_variant(model_and_params):
    """Separate caption streams per modality (model/vast.py:351-371); the
    reference's ret_vast27m path was broken/unexercised — ours must work."""
    model, params = model_and_params
    batch = dict(tiny_batch(with_subtitle=True))
    batch["vision_caption_tokens"] = batch["caption_tokens"]
    batch["vision_caption_attention_mask"] = batch["caption_attention_mask"]
    batch["audio_caption_tokens"] = batch["caption_tokens"]
    batch["audio_caption_attention_mask"] = batch["caption_attention_mask"]
    batch["omni_caption_tokens"] = batch["caption_tokens"]
    batch["omni_caption_attention_mask"] = batch["caption_attention_mask"]
    out = apply_model(model, params, batch,
                      "ret%tvas%tv%ta_cap%tvas%tv%ta")
    assert set(out) == {"loss_itc", "loss_itm", "loss_cap"}
    for v in out.values():
        assert np.isfinite(float(v))
