"""S3Gen weight-converter structural test: build a synthetic torch-layout
state dict (reference module tree / shapes) for the tiny config, convert, and
check the tree matches S3Gen.init + runs."""
import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_tpu.config import S3GenConfig
from chatterbox_tpu.models.s3gen.flow import fixed_noise
from chatterbox_tpu.models.s3gen.s3gen import S3Gen
from chatterbox_tpu.models.s3gen.weights import convert_s3gen_params


def _rand_s3gen_sd(c: S3GenConfig, rng):
    sd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.02

    def lin(base, i, o, bias=True):
        sd[f"{base}.weight"] = r(o, i)
        if bias:
            sd[f"{base}.bias"] = r(o)

    def conv(base, ci, co, k, bias=True, wn=False):
        if wn:
            sd[f"{base}.weight_g"] = np.abs(r(co, 1, 1)) + 0.5
            sd[f"{base}.weight_v"] = r(co, ci, k)
        else:
            sd[f"{base}.weight"] = r(co, ci, k)
        if bias:
            sd[f"{base}.bias"] = r(co)

    def ln(base, d):
        sd[f"{base}.weight"] = r(d)
        sd[f"{base}.bias"] = r(d)

    d = c.enc_dim
    # ---- flow.encoder ----
    for stage in ("embed", "up_embed"):
        lin(f"flow.encoder.{stage}.out.0", d, d)
        ln(f"flow.encoder.{stage}.out.1", d)
    ln("flow.encoder.after_norm", d)
    conv("flow.encoder.pre_lookahead_layer.conv1", d, d, c.pre_lookahead_len + 1)
    conv("flow.encoder.pre_lookahead_layer.conv2", d, d, 3)
    conv("flow.encoder.up_layer.conv", d, d, 5)
    for group, n in (("encoders", c.enc_blocks), ("up_encoders", c.enc_up_blocks)):
        for i in range(n):
            b = f"flow.encoder.{group}.{i}"
            for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
                lin(f"{b}.self_attn.{nm}", d, d)
            lin(f"{b}.self_attn.linear_pos", d, d, bias=False)
            sd[f"{b}.self_attn.pos_bias_u"] = r(c.enc_heads, d // c.enc_heads)
            sd[f"{b}.self_attn.pos_bias_v"] = r(c.enc_heads, d // c.enc_heads)
            ln(f"{b}.norm_mha", d)
            ln(f"{b}.norm_ff", d)
            lin(f"{b}.feed_forward.w_1", d, c.enc_ffn_dim)
            lin(f"{b}.feed_forward.w_2", c.enc_ffn_dim, d)

    # ---- flow top-level ----
    sd["flow.input_embedding.weight"] = r(c.speech_vocab_size, d)
    lin("flow.spk_embed_affine_layer", c.spk_embed_dim, c.n_mels)
    lin("flow.encoder_proj", d, c.n_mels)

    # ---- flow.decoder.estimator ----
    ch = c.est_channels
    tdim = ch * 4
    e = "flow.decoder.estimator"
    lin(f"{e}.time_mlp.linear_1", c.est_in_channels, tdim)
    lin(f"{e}.time_mlp.linear_2", tdim, tdim)

    def resnet(base, cin, cout):
        conv(f"{base}.block1.block.0", cin, cout, 3)
        ln(f"{base}.block1.block.2", cout)
        conv(f"{base}.block2.block.0", cout, cout, 3)
        ln(f"{base}.block2.block.2", cout)
        lin(f"{base}.mlp.1", tdim, cout)
        conv(f"{base}.res_conv", cin, cout, 1)

    def tfmr(base, dim):
        inner = c.est_heads * c.est_head_dim
        ln(f"{base}.norm1", dim)
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{base}.attn1.{nm}", dim, inner, bias=False)
        lin(f"{base}.attn1.to_out.0", inner, dim)
        ln(f"{base}.norm3", dim)
        lin(f"{base}.ff.net.0.proj", dim, dim * 4)
        lin(f"{base}.ff.net.2", dim * 4, dim)

    cin = c.est_in_channels
    resnet(f"{e}.down_blocks.0.0", cin, ch)
    for j in range(c.est_n_blocks):
        tfmr(f"{e}.down_blocks.0.1.{j}", ch)
    conv(f"{e}.down_blocks.0.2", ch, ch, 3)
    for i in range(c.est_mid_blocks):
        resnet(f"{e}.mid_blocks.{i}.0", ch, ch)
        for j in range(c.est_n_blocks):
            tfmr(f"{e}.mid_blocks.{i}.1.{j}", ch)
    resnet(f"{e}.up_blocks.0.0", ch * 2, ch)
    for j in range(c.est_n_blocks):
        tfmr(f"{e}.up_blocks.0.1.{j}", ch)
    conv(f"{e}.up_blocks.0.2", ch, ch, 3)
    conv(f"{e}.final_block.block.0", ch, ch, 3)
    ln(f"{e}.final_block.block.2", ch)
    conv(f"{e}.final_proj", ch, c.n_mels, 1)

    # ---- mel2wav (HiFT) ----
    h = "mel2wav"
    base_ch = c.hift_base_channels
    for i in range(5):
        conv(f"{h}.f0_predictor.condnet.{2 * i}",
             c.n_mels if i == 0 else c.f0_cond_channels,
             c.f0_cond_channels, 3, wn=True)
    lin(f"{h}.f0_predictor.classifier", c.f0_cond_channels, 1)
    lin(f"{h}.m_source.l_linear", c.hift_nb_harmonics + 1, 1)
    conv(f"{h}.conv_pre", c.n_mels, base_ch, 7, wn=True)
    nfft = c.istft_n_fft
    down_cum = np.cumprod([1] + list(c.upsample_rates[::-1][:-1]))[::-1]
    for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
        co = base_ch // (2 ** (i + 1))
        ci = base_ch // (2 ** i)
        # ConvTranspose under weight norm: torch weight [in, out, k]
        sd[f"{h}.ups.{i}.weight_g"] = np.abs(r(ci, 1, 1)) + 0.5
        sd[f"{h}.ups.{i}.weight_v"] = r(ci, co, k)
        sd[f"{h}.ups.{i}.bias"] = r(co)
        du = int(down_cum[i])
        conv(f"{h}.source_downs.{i}", nfft + 2, co,
             1 if du == 1 else du * 2, wn=True)
        for j in range(len(c.source_resblock_dilations[i])):
            ksz = c.source_resblock_kernel_sizes[i]
            conv(f"{h}.source_resblocks.{i}.convs1.{j}", co, co, ksz, wn=True)
            conv(f"{h}.source_resblocks.{i}.convs2.{j}", co, co, ksz, wn=True)
            sd[f"{h}.source_resblocks.{i}.activations1.{j}.alpha"] = np.ones(co, np.float32)
            sd[f"{h}.source_resblocks.{i}.activations2.{j}.alpha"] = np.ones(co, np.float32)
        for j, ksz in enumerate(c.resblock_kernel_sizes):
            rb = f"{h}.resblocks.{i * len(c.resblock_kernel_sizes) + j}"
            for jj in range(len(c.resblock_dilations[j])):
                conv(f"{rb}.convs1.{jj}", co, co, ksz, wn=True)
                conv(f"{rb}.convs2.{jj}", co, co, ksz, wn=True)
                sd[f"{rb}.activations1.{jj}.alpha"] = np.ones(co, np.float32)
                sd[f"{rb}.activations2.{jj}.alpha"] = np.ones(co, np.float32)
    conv(f"{h}.conv_post", base_ch // 8, nfft + 2, 7, wn=True)
    return sd


def test_s3gen_converter_tree_matches_init():
    cfg = S3GenConfig.tiny()
    model = S3Gen(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tp, T = 1, 3, 8
    tokens = jnp.zeros((B, T), jnp.int32)
    tlen = jnp.full((B,), T, jnp.int32)
    pfeat = jnp.zeros((B, 2 * Tp, cfg.n_mels))
    pflen = jnp.full((B,), 2 * Tp, jnp.int32)
    emb = jnp.zeros((B, cfg.spk_embed_dim))
    noise = jnp.broadcast_to(fixed_noise(cfg.n_mels)[:, :2 * T],
                             (B, 2 * T, cfg.n_mels))
    rngs = jax.random.split(rng, B)
    init_params = jax.jit(lambda r: model.init(
        r, tokens, tlen, pfeat, pflen, emb, noise, rngs, n_timesteps=1))(rng)

    sd = _rand_s3gen_sd(cfg, np.random.default_rng(0))
    conv = convert_s3gen_params(sd, cfg)

    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init_params)
    conv_shapes = jax.tree.map(lambda x: tuple(x.shape), conv)
    if init_shapes != conv_shapes:
        flat_i = jax.tree_util.tree_flatten_with_path(init_shapes)[0]
        flat_c = jax.tree_util.tree_flatten_with_path(conv_shapes)[0]
        pi = {jax.tree_util.keystr(k): v for k, v in flat_i}
        pc = {jax.tree_util.keystr(k): v for k, v in flat_c}
        missing = sorted(set(pi) - set(pc))[:8]
        extra = sorted(set(pc) - set(pi))[:8]
        diff = sorted(k for k in set(pi) & set(pc) if pi[k] != pc[k])[:8]
        raise AssertionError(
            f"missing={missing}\nextra={extra}\n"
            f"shape-diff={[(k, pi[k], pc[k]) for k in diff]}")

    # converted params must run end to end
    wav, wl = jax.jit(lambda p: model.apply(
        p, tokens, tlen, pfeat, pflen, emb, noise, rngs, n_timesteps=1))(conv)
    assert np.isfinite(np.asarray(wav)).all()


def test_campplus_converter_tree_matches_init():
    from chatterbox_tpu.models.s3gen.weights import convert_campplus_params
    from chatterbox_tpu.models.s3gen.xvector import CAMPPlus

    rng = np.random.default_rng(1)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.02
    sd = {}

    def bn(base, c):
        sd[f"{base}.running_mean"] = r(c)
        sd[f"{base}.running_var"] = np.abs(r(c)) + 1.0
        sd[f"{base}.weight"] = r(c)
        sd[f"{base}.bias"] = r(c)

    def bn_noaffine(base, c):
        sd[f"{base}.running_mean"] = r(c)
        sd[f"{base}.running_var"] = np.abs(r(c)) + 1.0

    m = 32
    p = "speaker_encoder"
    sd[f"{p}.head.conv1.weight"] = r(m, 1, 3, 3)
    bn(f"{p}.head.bn1", m)
    for li in (1, 2):
        for bi in range(2):
            b = f"{p}.head.layer{li}.{bi}"
            sd[f"{b}.conv1.weight"] = r(m, m, 3, 3)
            bn(f"{b}.bn1", m)
            sd[f"{b}.conv2.weight"] = r(m, m, 3, 3)
            bn(f"{b}.bn2", m)
            if bi == 0:  # stride-2 block has a shortcut
                sd[f"{b}.shortcut.0.weight"] = r(m, m, 1, 1)
                bn(f"{b}.shortcut.1", m)
    sd[f"{p}.head.conv2.weight"] = r(m, m, 3, 3)
    bn(f"{p}.head.bn2", m)
    ch = m * 10  # 80 mels / 8
    sd[f"{p}.xvector.tdnn.linear.weight"] = r(128, ch, 5)
    bn(f"{p}.xvector.tdnn.nonlinear.batchnorm", 128)
    channels = 128
    for bi, nl in zip((1, 2, 3), (12, 24, 16)):
        for li in range(nl):
            cin = channels + li * 32
            b = f"{p}.xvector.block{bi}.tdnnd{li + 1}"
            bn(f"{b}.nonlinear1.batchnorm", cin)
            sd[f"{b}.linear1.weight"] = r(128, cin, 1)
            bn(f"{b}.nonlinear2.batchnorm", 128)
            sd[f"{b}.cam_layer.linear_local.weight"] = r(32, 128, 3)
            sd[f"{b}.cam_layer.linear1.weight"] = r(64, 128, 1)
            sd[f"{b}.cam_layer.linear1.bias"] = r(64)
            sd[f"{b}.cam_layer.linear2.weight"] = r(32, 64, 1)
            sd[f"{b}.cam_layer.linear2.bias"] = r(32)
        channels += nl * 32
        bn(f"{p}.xvector.transit{bi}.nonlinear.batchnorm", channels)
        sd[f"{p}.xvector.transit{bi}.linear.weight"] = r(channels // 2, channels, 1)
        channels //= 2
    bn(f"{p}.xvector.out_nonlinear.batchnorm", channels)
    sd[f"{p}.xvector.dense.linear.weight"] = r(192, channels * 2, 1)
    bn_noaffine(f"{p}.xvector.dense.nonlinear.batchnorm", 192)

    conv = convert_campplus_params(sd)
    model = CAMPPlus()
    init = jax.jit(lambda r_: model.init(r_, jnp.zeros((1, 220, 80))))(
        jax.random.PRNGKey(0))
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init)
    conv_shapes = jax.tree.map(lambda x: tuple(x.shape), conv)
    assert init_shapes == conv_shapes

    out = jax.jit(lambda pr: model.apply(pr, jnp.zeros((1, 220, 80))))(conv)
    assert out.shape == (1, 192)
    assert np.isfinite(np.asarray(out)).all()
