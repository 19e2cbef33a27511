"""Numerical parity for the two quality-critical S3Gen pieces that had only
structural tests: the CFM estimator U-Net (reference s3gen/decoder.py
ConditionalDecoder :233-317) and the Euler CFM solver (reference
s3gen/flow_matching.py solve_euler :82-133 / CausalConditionalCFM :198-228),
run through OUR weight converter on the reference's own torch module code.

The reference estimator depends on pip packages absent offline (diffusers,
conformer, omegaconf).  Only three leaf behaviors actually execute at
runtime: diffusers ``Attention`` (plain SDPA: biasless q/k/v, d_head**-0.5
scale, additive float mask, biased out proj), diffusers ``GELU``
(Linear+exact gelu) used by the FeedForward, and ``get_activation('silu')``.
Those are stubbed faithfully below (documented against diffusers 0.2x
sources); everything else — the U-Net composition, causal convs, masks,
skip connections, time embedding, the euler loop with its batch-2 CFG
stacking — runs the reference's own code verbatim via importlib."""
import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/chatterbox_vllm/models/s3gen")

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# dependency stubs (see module docstring)
# ---------------------------------------------------------------------------
def _install_stubs():
    if "diffusers" in sys.modules:
        return

    class GELU(torch.nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none"):
            super().__init__()
            self.proj = torch.nn.Linear(dim_in, dim_out)
            self.approximate = approximate

        def forward(self, x):
            return F.gelu(self.proj(x), approximate=self.approximate)

    class GEGLU(torch.nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = torch.nn.Linear(dim_in, dim_out * 2)

        def forward(self, x):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return h * F.gelu(gate)

    class ApproximateGELU(torch.nn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = torch.nn.Linear(dim_in, dim_out)

        def forward(self, x):
            x = self.proj(x)
            return x * torch.sigmoid(1.702 * x)

    class _AdaNorm(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("not used by ConditionalDecoder")

    class Attention(torch.nn.Module):
        """diffusers.models.attention_processor.Attention, restricted to the
        configuration decoder.py uses (self-attn, bias=False, dropout 0,
        no group norm, scale = dim_head**-0.5, additive float mask)."""

        def __init__(self, query_dim, heads=8, dim_head=64, dropout=0.0,
                     bias=False, cross_attention_dim=None,
                     upcast_attention=False, **_):
            super().__init__()
            assert cross_attention_dim is None
            inner = heads * dim_head
            self.heads, self.dim_head = heads, dim_head
            self.scale = dim_head ** -0.5
            self.to_q = torch.nn.Linear(query_dim, inner, bias=bias)
            self.to_k = torch.nn.Linear(query_dim, inner, bias=bias)
            self.to_v = torch.nn.Linear(query_dim, inner, bias=bias)
            self.to_out = torch.nn.ModuleList(
                [torch.nn.Linear(inner, query_dim), torch.nn.Dropout(dropout)])

        def forward(self, x, encoder_hidden_states=None, attention_mask=None):
            assert encoder_hidden_states is None
            B, T, _ = x.shape
            h, d = self.heads, self.dim_head
            q = self.to_q(x).view(B, T, h, d).transpose(1, 2)
            k = self.to_k(x).view(B, T, h, d).transpose(1, 2)
            v = self.to_v(x).view(B, T, h, d).transpose(1, 2)
            scores = (q @ k.transpose(-1, -2)) * self.scale
            if attention_mask is not None:
                scores = scores + attention_mask[:, None]
            w = scores.float().softmax(-1).to(x.dtype)
            o = (w @ v).transpose(1, 2).reshape(B, T, h * d)
            return self.to_out[1](self.to_out[0](o))

    def get_activation(name):
        return {"silu": torch.nn.SiLU(), "mish": torch.nn.Mish(),
                "gelu": torch.nn.GELU(), "relu": torch.nn.ReLU()}[name]

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    diff = _mod("diffusers")
    diff.models = _mod("diffusers.models")
    _mod("diffusers.models.attention", GEGLU=GEGLU, GELU=GELU,
         AdaLayerNorm=_AdaNorm, AdaLayerNormZero=_AdaNorm,
         ApproximateGELU=ApproximateGELU)
    _mod("diffusers.models.attention_processor", Attention=Attention)
    _mod("diffusers.models.activations", get_activation=get_activation)
    _mod("diffusers.models.lora", LoRACompatibleLinear=torch.nn.Linear)
    diff.utils = _mod("diffusers.utils")
    _mod("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda c: c)

    class ConformerBlock(torch.nn.Module):   # legacy matcha path, unused
        def __init__(self, **kw):
            super().__init__()

    _mod("conformer", ConformerBlock=ConformerBlock)

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    om = _mod("omegaconf")
    om.OmegaConf = types.SimpleNamespace(create=lambda d: _Cfg(d))
    om.DictConfig = _Cfg


def load_ref(mod_name: str):
    if not REF.exists():
        pytest.skip("reference source not available")
    _install_stubs()
    if "refs3gen" not in sys.modules:
        pkg = types.ModuleType("refs3gen")
        pkg.__path__ = [str(REF)]
        pkg.__package__ = "refs3gen"
        sys.modules["refs3gen"] = pkg
    return importlib.import_module(f"refs3gen.{mod_name}")


def _small_ref_estimator(n_mels, mid_blocks, seed=0):
    ref_dec = load_ref("decoder")
    torch.manual_seed(seed)
    est = ref_dec.ConditionalDecoder(
        in_channels=4 * n_mels, out_channels=n_mels, causal=True,
        channels=[32], dropout=0.0, attention_head_dim=16, n_blocks=1,
        num_mid_blocks=mid_blocks, num_heads=2, act_fn="gelu").eval()
    # kaiming init leaves LN/bias at trivial values; perturb everything so a
    # converter transposition/misroute cannot hide behind zeros/ones
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in est.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
    return est


def _our_cfg(n_mels, mid_blocks):
    import dataclasses
    from chatterbox_tpu.config import S3GenConfig
    return dataclasses.replace(
        S3GenConfig.tiny(), n_mels=n_mels, est_in_channels=4 * n_mels,
        est_channels=32, est_n_blocks=1, est_mid_blocks=mid_blocks,
        est_heads=2, est_head_dim=16, use_flash_attention=False)


@pytest.mark.filterwarnings("ignore")
def test_estimator_matches_reference_torch():
    """ConditionalDecoder parity: same weights through our converter, ragged
    mask, max error <= 3e-3 of output scale on the valid region."""
    import jax.numpy as jnp
    from chatterbox_tpu.models.s3gen.estimator import ConditionalDecoder
    from chatterbox_tpu.models.s3gen.weights import SD, _estimator_params

    n_mels, mid = 16, 2
    est = _small_ref_estimator(n_mels, mid)
    cfg = _our_cfg(n_mels, mid)

    sd = {"flow.decoder.estimator." + k: v.detach().numpy()
          for k, v in est.state_dict().items()}
    params = {"params": _estimator_params(SD(sd, "flow."), cfg)}

    B, T = 2, 20
    rs = np.random.default_rng(2)
    x = rs.standard_normal((B, n_mels, T)).astype(np.float32)
    mu = rs.standard_normal((B, n_mels, T)).astype(np.float32)
    cond = rs.standard_normal((B, n_mels, T)).astype(np.float32)
    spks = rs.standard_normal((B, n_mels)).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    lens = np.asarray([20, 13])
    mask = (np.arange(T)[None] < lens[:, None])

    with torch.no_grad():
        ref = est(torch.from_numpy(x),
                  torch.from_numpy(mask[:, None].astype(np.float32)),
                  torch.from_numpy(mu), torch.from_numpy(t),
                  torch.from_numpy(spks),
                  torch.from_numpy(cond)).numpy()

    ours = ConditionalDecoder(cfg)
    got = np.asarray(ours.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1))))
    got = got.transpose(0, 2, 1)

    scale = np.abs(ref).max() + 1e-9
    for b in range(B):
        err = np.abs(got[b, :, :lens[b]] - ref[b, :, :lens[b]]).max()
        assert err < 3e-3 * scale, (b, err, scale)


@pytest.mark.filterwarnings("ignore")
def test_cfm_euler_solver_matches_reference_torch():
    """solve_euler parity with pinned noise: the reference's batch-2 CFG
    stacking + cosine schedule vs our 2B-lane fori_loop, through the same
    converted estimator (reference flow_matching.py:82-133, noise pinning
    per :198-228).  The reference solver hardcodes 80 mel channels."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.config import S3GenConfig
    from chatterbox_tpu.models.s3gen.flow import CausalFlow
    from chatterbox_tpu.models.s3gen.weights import SD, _estimator_params

    ref_fm = load_ref("flow_matching")
    n_mels, mid, steps = 80, 1, 4
    est = _small_ref_estimator(n_mels, mid, seed=5)
    cfm = ref_fm.CausalConditionalCFM(estimator=est).eval()

    B, T = 1, 18
    rs = np.random.default_rng(7)
    mu = rs.standard_normal((B, n_mels, T)).astype(np.float32)
    spks = rs.standard_normal((B, n_mels)).astype(np.float32)
    cond = rs.standard_normal((B, n_mels, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)

    with torch.no_grad():
        ref_mel, _ = cfm(torch.from_numpy(mu), torch.from_numpy(mask),
                         n_timesteps=steps, spks=torch.from_numpy(spks),
                         cond=torch.from_numpy(cond))
    ref_mel = ref_mel.numpy()
    z = cfm.rand_noise[:, :, :T].numpy()           # the pinned noise buffer

    cfg = dataclasses.replace(
        _our_cfg(n_mels, mid),
        inference_cfg_rate=float(cfm.inference_cfg_rate))
    flow = CausalFlow(cfg)
    # init the full flow (encoder params unused by solve_euler), then swap
    # in the converted estimator weights
    toks = jnp.zeros((B, T // 2), jnp.int32)
    tlen = jnp.full((B,), T // 2, jnp.int32)
    init = jax.jit(lambda r: flow.init(
        r, toks, tlen, jnp.zeros((B, 4, n_mels)), jnp.full((B,), 4, jnp.int32),
        jnp.zeros((B, cfg.spk_embed_dim)), jnp.zeros((B, T, n_mels)),
        n_timesteps=1))(jax.random.PRNGKey(0))
    sd = {"flow.decoder.estimator." + k: v.detach().numpy()
          for k, v in est.state_dict().items()}
    params = dict(init)
    params["params"] = dict(init["params"])
    params["params"]["estimator"] = jax.tree.map(
        jnp.asarray, _estimator_params(SD(sd, "flow."), cfg))

    got = flow.apply(
        params, jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(mask[:, 0].astype(bool)), jnp.asarray(spks),
        jnp.asarray(cond.transpose(0, 2, 1)), steps,
        method=lambda m, *a: m.solve_euler(*a))
    got = np.asarray(got).transpose(0, 2, 1)

    scale = np.abs(ref_mel).max() + 1e-9
    err = np.abs(got - ref_mel).max()
    assert err < 3e-3 * scale, (err, scale)
