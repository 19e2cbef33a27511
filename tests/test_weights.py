"""Weight-converter tests: torch-layout state dicts -> flax params.

The VoiceEncoder test uses torch.nn.LSTM as a numerical oracle; the T3 test
checks the converted tree is shape-identical to model.init's tree."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from chatterbox_tpu.config import T3ModelConfig
from chatterbox_tpu.models.t3.model import T3Model
from chatterbox_tpu.models.t3.weights import convert_t3_params
from chatterbox_tpu.models.voice_encoder.model import VoiceEncoder
from chatterbox_tpu.models.voice_encoder.weights import convert_voice_encoder_params


def test_voice_encoder_matches_torch_lstm():
    D, H, E = 8, 12, 6
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(D, H, num_layers=3, batch_first=True)
    proj = torch.nn.Linear(H, E)
    sd = {f"lstm.{k}": v.detach().numpy() for k, v in
          lstm.state_dict().items()}
    sd.update({f"proj.{k}": v.detach().numpy() for k, v in
               proj.state_dict().items()})

    x = torch.randn(3, 20, D)
    with torch.no_grad():
        _, (h_n, _) = lstm(x)
        ref = torch.relu(proj(h_n[-1]))
        ref = ref / ref.norm(dim=1, keepdim=True)

    model = VoiceEncoder(num_mels=D, hidden=H, embed_size=E)
    params = convert_voice_encoder_params(sd)
    out = jax.jit(lambda p, m: model.apply(p, m))(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def _rand_t3_sd(cfg: T3ModelConfig, rng):
    """Synthetic torch-layout T3 state dict with reference key names
    (tts.py:105-117, t3.py:347-379)."""
    H, D = cfg.hidden_size, cfg.speaker_embed_size
    sd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.02
    sd["text_emb.weight"] = r(cfg.text_vocab_size, H)
    sd["speech_emb.weight"] = r(cfg.speech_vocab_size, H)
    sd["text_pos_emb.emb.weight"] = r(cfg.max_text_tokens + 2, H)
    sd["speech_pos_emb.emb.weight"] = r(cfg.max_speech_tokens + 4, H)
    sd["cond_enc.spkr_enc.weight"] = r(H, D)
    sd["cond_enc.spkr_enc.bias"] = r(H)
    sd["cond_enc.emotion_adv_fc.weight"] = r(H, 1)
    sd["cond_enc.perceiver.pre_attention_query"] = r(1, cfg.perceiver_n_queries, H)
    for nm in ("to_q", "to_k", "to_v", "proj_out"):
        sd[f"cond_enc.perceiver.attn.{nm}.weight"] = r(H, H)
        sd[f"cond_enc.perceiver.attn.{nm}.bias"] = r(H)
    sd["cond_enc.perceiver.attn.norm.weight"] = r(H)
    sd["cond_enc.perceiver.attn.norm.bias"] = r(H)
    hd = cfg.n_heads * cfg.head_dim
    for i in range(cfg.n_layers):
        p = f"tfmr.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = r(hd, H)
        sd[f"{p}.self_attn.k_proj.weight"] = r(cfg.n_kv_heads * cfg.head_dim, H)
        sd[f"{p}.self_attn.v_proj.weight"] = r(cfg.n_kv_heads * cfg.head_dim, H)
        sd[f"{p}.self_attn.o_proj.weight"] = r(H, hd)
        sd[f"{p}.mlp.gate_proj.weight"] = r(cfg.intermediate_size, H)
        sd[f"{p}.mlp.up_proj.weight"] = r(cfg.intermediate_size, H)
        sd[f"{p}.mlp.down_proj.weight"] = r(H, cfg.intermediate_size)
        sd[f"{p}.input_layernorm.weight"] = r(H)
        sd[f"{p}.post_attention_layernorm.weight"] = r(H)
    sd["tfmr.norm.weight"] = r(H)
    sd["speech_head.weight"] = r(cfg.speech_vocab_size, H)
    return sd


def test_t3_converter_tree_matches_init():
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt = 1, 4
    init_params = jax.jit(lambda r: model.init(
        r,
        jnp.zeros((B, cfg.speaker_embed_size)),
        jnp.zeros((B, 5), jnp.int32),
        jnp.zeros((B, 1)),
        jnp.zeros((B, Tt), jnp.int32),
        jnp.full((B,), Tt, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)

    sd = _rand_t3_sd(cfg, np.random.default_rng(1))
    conv = convert_t3_params(sd, cfg)

    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init_params)
    conv_shapes = jax.tree.map(lambda x: tuple(x.shape), conv)
    assert init_shapes == conv_shapes, (
        f"tree mismatch:\ninit={init_shapes}\nconv={conv_shapes}")

    # converted params must actually run
    out = jax.jit(lambda p: model.apply(
        p,
        jnp.zeros((B, cfg.speaker_embed_size)),
        jnp.zeros((B, 5), jnp.int32),
        0.5 * jnp.ones((B, 1)),
        method=lambda m, *a: m.encode_conditionals(*a)))(conv)
    assert out.shape == (B, cfg.cond_len, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_roundtrip(tmp_path):
    from chatterbox_tpu.utils.checkpoint import (flatten_tree, load_params,
                                                 save_params, unflatten_tree)
    tree = {"a": {"b": np.ones((2, 3)), "c": {"d": np.zeros(4)}},
            "e": np.arange(5)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a::b", "a::c::d", "e"}
    assert unflatten_tree(flat)["a"]["c"]["d"].shape == (4,)
    p = tmp_path / "ckpt.npz"
    save_params(str(p), tree)
    back = load_params(str(p))
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["e"], tree["e"])
