"""Numerical parity vs the reference's own torch module code.

Loads reference source files standalone (importlib, bypassing package
__init__ chains that need vllm/torchaudio), builds the torch module with
synthetic weights, converts the state_dict through our weight converters,
and checks our flax module reproduces the torch output on the same input.

Randomness is pinned for the comparison: NSF noise_std=0, all-voiced
(threshold -1), and both frameworks' random harmonic initial phases are
forced to zero (the only intentional nondeterminism in the pipeline).
"""
import importlib.util
import os
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/chatterbox_vllm/models/s3gen")

torch = pytest.importorskip("torch")


def load_ref(name: str, fname: str):
    if not (REF / fname).exists():
        pytest.skip("reference source not available")
    spec = importlib.util.spec_from_file_location(name, REF / fname)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.filterwarnings("ignore")
def test_hift_generator_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.config import S3GenConfig
    from chatterbox_tpu.models.s3gen.hifigan import HiFTGenerator
    from chatterbox_tpu.models.s3gen.weights import SD, _hift_params

    ref_f0 = load_ref("ref_f0_predictor", "f0_predictor.py")
    ref_hift = load_ref("ref_hifigan", "hifigan.py")

    torch.manual_seed(0)
    cfg = S3GenConfig()
    small = dict(base_channels=64, nb_harmonics=2)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, hift_base_channels=small["base_channels"],
        hift_nb_harmonics=small["nb_harmonics"], nsf_sigma=0.0,
        nsf_voiced_threshold=-1.0, f0_cond_channels=64)

    f0p = ref_f0.ConvRNNF0Predictor(num_class=1, in_channels=80,
                                    cond_channels=cfg.f0_cond_channels)
    gen = ref_hift.HiFTGenerator(
        in_channels=80, base_channels=cfg.hift_base_channels,
        nb_harmonics=cfg.hift_nb_harmonics, sampling_rate=24000,
        nsf_alpha=cfg.nsf_alpha, nsf_sigma=0.0, nsf_voiced_threshold=-1.0,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop},
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilations],
        source_resblock_kernel_sizes=list(cfg.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[list(d) for d
                                        in cfg.source_resblock_dilations],
        lrelu_slope=cfg.lrelu_slope, audio_limit=cfg.audio_limit,
        f0_predictor=f0p).eval()

    B, T = 1, 24
    rs = np.random.default_rng(0)
    mel = rs.standard_normal((B, 80, T)).astype(np.float32) * 0.5

    # pin the reference's random harmonic initial phases + any residual noise
    real_rand, real_randn_like = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.zeros(*a, **k)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    try:
        with torch.no_grad():
            ref_wav = gen.inference(speech_feat=torch.from_numpy(mel))
            if isinstance(ref_wav, tuple):
                ref_wav = ref_wav[0]
        ref_wav = ref_wav.numpy().reshape(B, -1)
    finally:
        torch.rand, torch.randn_like = real_rand, real_randn_like

    # convert weights -> flax
    sd = {"mel2wav." + k: v.detach().numpy()
          for k, v in gen.state_dict().items()}
    params = {"params": _hift_params(SD(sd), cfg)}

    ours = HiFTGenerator(cfg)
    # pin our side's phase/noise draws to zero too
    real_uniform, real_normal = jax.random.uniform, jax.random.normal
    jax.random.uniform = lambda key, shape=(), **k: jnp.zeros(shape)
    jax.random.normal = lambda key, shape=(), **k: jnp.zeros(shape)
    try:
        wav = ours.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                         jax.random.split(jax.random.PRNGKey(0), B))
        if isinstance(wav, tuple):
            wav = wav[0]
    finally:
        jax.random.uniform, jax.random.normal = real_uniform, real_normal

    got = np.asarray(wav, np.float32).reshape(B, -1)
    n = min(got.shape[1], ref_wav.shape[1])
    ref_c, got_c = ref_wav[:, :n], got[:, :n]
    corr = np.corrcoef(ref_c.ravel(), got_c.ravel())[0, 1]
    err = np.abs(ref_c - got_c)
    scale = np.abs(ref_c).max() + 1e-9
    # The NSF sine phase is an 11k-sample f32 cumsum; its rounding
    # differences between torch and XLA integrate linearly (~1e-3/10k
    # samples), so assert tight parity early and bounded drift overall.
    assert corr > 0.995, (corr, err.max(), scale)
    head = err[:, : n // 5]
    assert head.max() < 2.5e-2 * scale, (corr, head.max(), scale)
    assert err.max() < 0.15 * scale, (corr, err.max(), scale)
    # and the drift really is positional: last fifth > first fifth
    assert err[:, -n // 5:].mean() > head.mean()


def load_ref_pkg(pkg_name: str, root: Path):
    """Register a synthetic package rooted at `root` (skipping the real
    __init__.py chains that import vllm/torchaudio) so relative imports in
    the reference files resolve."""
    import types
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    mod = types.ModuleType(pkg_name)
    mod.__path__ = [str(root)]
    mod.__package__ = pkg_name
    sys.modules[pkg_name] = mod
    return mod


@pytest.mark.filterwarnings("ignore")
def test_cond_enc_perceiver_matches_reference_torch():
    """T3CondEnc (speaker proj + perceiver resampler + emotion) numerical
    parity on identical weights (reference cond_enc.py:80-123)."""
    import importlib
    import jax.numpy as jnp
    from chatterbox_tpu.config import T3ModelConfig
    from chatterbox_tpu.models.t3.cond_enc import T3CondEnc
    from chatterbox_tpu.models.t3.weights import convert_t3_cond_enc

    t3mod = Path("/root/reference/src/chatterbox_vllm/models/t3/modules")
    if not t3mod.exists():
        pytest.skip("reference source not available")
    load_ref_pkg("reft3", t3mod)
    ref_ce = importlib.import_module("reft3.cond_enc")
    ref_cfgmod = importlib.import_module("reft3.t3_config")

    torch.manual_seed(0)
    tcfg = ref_cfgmod.T3Config()          # full-size: 1024-d, 32 queries
    ref = ref_ce.T3CondEnc(tcfg).eval()

    cfg = T3ModelConfig()
    sd = {"cond_enc." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = {"params": convert_t3_cond_enc(sd)}

    # the reference cond path is strictly batch-1 (speaker_emb.view(256),
    # cond_enc.py:88); compare one voice
    rs = np.random.default_rng(1)
    spk = rs.standard_normal((1, tcfg.speaker_embed_size)).astype(np.float32)
    prompt_emb = rs.standard_normal(
        (1, tcfg.speech_cond_prompt_len, tcfg.n_channels)).astype(np.float32)
    emotion = np.full((1, 1, 1), 0.3, np.float32)

    with torch.no_grad():
        cond = ref_ce.T3Cond(
            speaker_emb=torch.from_numpy(spk),
            cond_prompt_speech_tokens=torch.ones(
                tcfg.speech_cond_prompt_len, dtype=torch.long),
            cond_prompt_speech_emb=torch.from_numpy(prompt_emb),
            emotion_adv=torch.from_numpy(emotion))
        ref_out = ref(cond).numpy()[None]          # [1, 34, 1024]

    ours = T3CondEnc(cfg)
    got = np.asarray(ours.apply(params, jnp.asarray(spk),
                                jnp.asarray(prompt_emb),
                                jnp.asarray(emotion[:, 0])), np.float32)
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    err = np.abs(got - ref_out).max()
    assert err < 2e-4 * max(1.0, np.abs(ref_out).max()), err


def _cond_enc_only(sd, cfg):
    """Extract just the cond_enc subtree via the full converter with dummy
    backbone keys if the converter requires them."""
    from chatterbox_tpu.models.t3.weights import convert_t3_cond_enc
    try:
        return {"cond_enc": convert_t3_params(sd, cfg)["cond_enc"]}
    except KeyError:
        full = convert_t3_params(sd, cfg, strict=False)
        return {"cond_enc": full["cond_enc"]}


@pytest.mark.filterwarnings("ignore")
def test_upsample_conformer_encoder_matches_reference_torch():
    """Token->mel conformer encoder parity on identical weights
    (reference transformer/upsample_encoder.py:237-304; full-size dims —
    the reference hardcodes 512 channels in its up_layer)."""
    import importlib
    import jax.numpy as jnp
    from chatterbox_tpu.config import S3GenConfig
    from chatterbox_tpu.models.s3gen.encoder import UpsampleConformerEncoder
    from chatterbox_tpu.models.s3gen.weights import SD, _encoder_params

    s3 = Path("/root/reference/src/chatterbox_vllm/models/s3gen")
    if not s3.exists():
        pytest.skip("reference source not available")
    load_ref_pkg("refs3", s3)
    ref_enc_mod = importlib.import_module("refs3.transformer.upsample_encoder")

    torch.manual_seed(0)
    ref = ref_enc_mod.UpsampleConformerEncoder(
        output_size=512, attention_heads=8, linear_units=2048, num_blocks=6,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, normalize_before=True,
        input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", input_size=512,
        use_cnn_module=False, macaron_style=False).eval()

    cfg = S3GenConfig()
    sd = {"encoder." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = {"params": _encoder_params(SD(sd), cfg)}

    B, T = 1, 32
    rs = np.random.default_rng(2)
    x = (rs.standard_normal((B, T, 512)) * 0.3).astype(np.float32)
    xlen = np.array([T], np.int32)

    with torch.no_grad():
        ref_out, ref_mask = ref(torch.from_numpy(x), torch.from_numpy(xlen))
    ref_out = ref_out.numpy()

    ours = UpsampleConformerEncoder(cfg)
    got, new_len = ours.apply(params, jnp.asarray(x), jnp.asarray(xlen))
    got = np.asarray(got, np.float32)

    assert got.shape[1] >= ref_out.shape[1]
    n = ref_out.shape[1]
    err = np.abs(got[:, :n] - ref_out).max()
    scale = np.abs(ref_out).max()
    assert err < 3e-3 * scale, (err, scale)


@pytest.mark.filterwarnings("ignore")
def test_t3_backbone_matches_hf_llama():
    """Our scanned Llama trunk must reproduce HF transformers' LlamaModel
    (the reference's backbone is vLLM's LlamaModel instantiated from
    t3-model/config.json — same architecture family: RMSNorm eps 1e-5,
    llama3-scaled RoPE theta 5e5, SwiGLU, no biases) on identical weights
    and input embeddings."""
    import jax
    import jax.numpy as jnp
    transformers = pytest.importorskip("transformers")
    from transformers.models.llama import LlamaConfig, LlamaModel

    from chatterbox_tpu.config import T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.models.t3.weights import convert_t3_params
    sys.path.insert(0, os.path.dirname(__file__))
    from test_weights import _rand_t3_sd

    cfg = T3ModelConfig.tiny()
    hf_cfg = LlamaConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads, num_key_value_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim, intermediate_size=cfg.intermediate_size,
        vocab_size=8, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling={"rope_type": "llama3",
                      "factor": cfg.rope_scaling_factor,
                      "low_freq_factor": cfg.rope_low_freq_factor,
                      "high_freq_factor": cfg.rope_high_freq_factor,
                      "original_max_position_embeddings": cfg.rope_original_max_pos},
        attention_bias=False, mlp_bias=False,
        max_position_embeddings=4096, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = LlamaModel(hf_cfg).float().eval()

    B, T = 2, 12
    embeds = torch.randn(B, T, cfg.hidden_size) * 0.5
    with torch.no_grad():
        ref = hf(inputs_embeds=embeds,
                 attention_mask=torch.ones(B, T, dtype=torch.long)
                 ).last_hidden_state.numpy()

    # route HF trunk weights through our reference-layout converter
    sd = _rand_t3_sd(cfg, np.random.default_rng(1))
    hf_sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    names = ("self_attn.q_proj.weight", "self_attn.k_proj.weight",
             "self_attn.v_proj.weight", "self_attn.o_proj.weight",
             "mlp.gate_proj.weight", "mlp.up_proj.weight",
             "mlp.down_proj.weight", "input_layernorm.weight",
             "post_attention_layernorm.weight")
    for i in range(cfg.n_layers):
        for nm in names:
            sd[f"tfmr.layers.{i}.{nm}"] = hf_sd[f"layers.{i}.{nm}"]
    sd["tfmr.norm.weight"] = hf_sd["norm.weight"]
    params = convert_t3_params(sd, cfg)

    model = T3Model(cfg)
    x = jnp.asarray(embeds.numpy())
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    vlen = jnp.full((B,), T, jnp.int32)
    hidden, _ = model.apply(
        params, method=lambda m: m.backbone(x, positions, vlen, mode="block"))
    got = np.asarray(hidden, np.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-4)
