"""S3 speech-tokenizer parity: flax S3TokenizerV2 + weight converter vs a
torch mirror of the ``s3tokenizer`` package's model_v2 (the package itself is
not installable offline; the mirror below reimplements its documented
semantics — whisper-style encoder with d**-0.25 q/k scaling, bias-free key,
FSMN depthwise-conv memory added after the out projection, two stride-2
convs, sinusoidal positions, and FSQ tanh*0.999 round base-3 encode — using
the EXACT checkpoint key layout found under ``tokenizer.*`` in the
reference's s3gen.safetensors, per reference s3gen.py:55 and
s3tokenizer.py:22-126)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def sinusoids_np(length, channels):
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


class MirrorAttn(torch.nn.Module):
    def __init__(self, dim, heads, kernel):
        super().__init__()
        self.query = torch.nn.Linear(dim, dim)
        self.key = torch.nn.Linear(dim, dim, bias=False)
        self.value = torch.nn.Linear(dim, dim)
        self.out = torch.nn.Linear(dim, dim)
        self.fsmn_block = torch.nn.Conv1d(dim, dim, kernel, groups=dim,
                                          bias=False)
        self.heads, self.kernel = heads, kernel

    def forward(self, x, key_mask):
        q, k, v = self.query(x), self.key(x), self.value(x)
        m = key_mask[..., None].to(x.dtype)
        vm = v * m
        pad = self.kernel - 1
        mem = self.fsmn_block(
            F.pad(vm.transpose(1, 2), (pad - pad // 2, pad // 2))
        ).transpose(1, 2)
        mem = (mem + vm) * m
        B, T, D = x.shape
        d = D // self.heads
        scale = d ** -0.25
        qh = (q.view(B, T, self.heads, d) * scale).permute(0, 2, 1, 3)
        kh = (k.view(B, T, self.heads, d) * scale).permute(0, 2, 3, 1)
        vh = v.view(B, T, self.heads, d).permute(0, 2, 1, 3)
        qk = qh @ kh
        qk = qk.masked_fill(~key_mask[:, None, None, :], -1e10)
        w = qk.float().softmax(-1).to(x.dtype)
        o = (w @ vh).permute(0, 2, 1, 3).reshape(B, T, D)
        return self.out(o) + mem


class MirrorBlock(torch.nn.Module):
    def __init__(self, dim, heads, kernel):
        super().__init__()
        self.attn = MirrorAttn(dim, heads, kernel)
        self.attn_ln = torch.nn.LayerNorm(dim)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(dim, dim * 4), torch.nn.GELU(),
            torch.nn.Linear(dim * 4, dim))
        self.mlp_ln = torch.nn.LayerNorm(dim)

    def forward(self, x, key_mask):
        x = x + self.attn(self.attn_ln(x), key_mask)
        return x + self.mlp(self.mlp_ln(x))


class MirrorEncoder(torch.nn.Module):
    def __init__(self, n_mels, dim, heads, layers, kernel):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(n_mels, dim, 3, stride=2, padding=1)
        self.conv2 = torch.nn.Conv1d(dim, dim, 3, stride=2, padding=1)
        self.blocks = torch.nn.ModuleList(
            [MirrorBlock(dim, heads, kernel) for _ in range(layers)])
        self.dim = dim

    def forward(self, mel, mel_len):
        F_ = mel.shape[2]
        m0 = (torch.arange(F_)[None] < mel_len[:, None]).to(mel.dtype)
        x = F.gelu(self.conv1(mel * m0[:, None]))
        len1 = (mel_len + 1) // 2
        m1 = (torch.arange(x.shape[2])[None] < len1[:, None]).to(x.dtype)
        x = F.gelu(self.conv2(x * m1[:, None]))
        tok_len = (len1 + 1) // 2
        x = x.permute(0, 2, 1)
        x = x + torch.from_numpy(sinusoids_np(x.shape[1], self.dim))
        mask = torch.arange(x.shape[1])[None] < tok_len[:, None]
        for b in self.blocks:
            x = b(x, mask)
        return x, tok_len, mask


class MirrorCodebook(torch.nn.Module):
    def __init__(self, dim, fsq=8):
        super().__init__()
        self.project_down = torch.nn.Linear(dim, fsq)

    def encode(self, x):
        h = self.project_down(x).float().tanh() * 0.9990000128746033
        digits = h.round().long() + 1
        powers = 3 ** torch.arange(h.shape[-1])
        return (digits * powers).sum(-1)


class MirrorQuantizer(torch.nn.Module):
    def __init__(self, dim, fsq=8):
        super().__init__()
        self._codebook = MirrorCodebook(dim, fsq)


class MirrorS3TokenizerV2(torch.nn.Module):
    def __init__(self, n_mels=128, dim=1280, heads=20, layers=2, kernel=31):
        super().__init__()
        self.encoder = MirrorEncoder(n_mels, dim, heads, layers, kernel)
        self.quantizer = MirrorQuantizer(dim)

    @torch.no_grad()
    def quantize(self, mel, mel_len):
        h, tok_len, mask = self.encoder(mel, mel_len)
        codes = self.quantizer._codebook.encode(h)
        return codes * mask, tok_len


@pytest.mark.filterwarnings("ignore")
def test_s3tokenizer_matches_torch_mirror():
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerV2
    from chatterbox_tpu.models.s3tokenizer.weights import (
        convert_s3tokenizer_params, has_s3tokenizer_weights)

    torch.manual_seed(0)
    mirror = MirrorS3TokenizerV2(layers=2)
    mirror.eval()
    sd = {f"tokenizer.{k}": v.numpy() for k, v in mirror.state_dict().items()}
    assert has_s3tokenizer_weights(sd)
    tree, cfg = convert_s3tokenizer_params(sd)
    assert (cfg.dim, cfg.n_heads, cfg.n_layers, cfg.fsmn_kernel,
            cfg.fsq_dims, cfg.n_mels) == (1280, 20, 2, 31, 8, 128)
    assert not cfg.ln_post

    rng = np.random.default_rng(3)
    B, F_ = 2, 104
    mel = rng.standard_normal((B, 128, F_)).astype(np.float32)
    mel_len = np.asarray([104, 57], np.int64)

    ref_tok, ref_len = mirror.quantize(torch.from_numpy(mel),
                                       torch.from_numpy(mel_len))
    model = S3TokenizerV2(cfg)
    got_tok, got_len = jax.jit(model.apply)(
        jax.tree.map(jnp.asarray, tree),
        jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(mel_len, jnp.int32))

    np.testing.assert_array_equal(np.asarray(got_len), ref_len.numpy())
    got = np.asarray(got_tok)
    ref = ref_tok.numpy()
    for b in range(B):
        L = int(ref_len[b])
        assert (got[b, :L] == ref[b, :L]).all(), \
            np.nonzero(got[b, :L] != ref[b, :L])
        assert got[b, :L].min() >= 0 and got[b, :L].max() < 6561


def test_s3tokenizer_token_rate():
    """6 s of 16 kHz audio -> 600 mel frames -> exactly 150 tokens (25 Hz),
    the contract the conditioning path relies on (s3tokenizer.py:14-19)."""
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.models.s3tokenizer.model import (S3TokenizerConfig,
                                                         S3TokenizerV2)
    cfg = S3TokenizerConfig.tiny()
    model = S3TokenizerV2(cfg)
    mel = jnp.zeros((1, 600, cfg.n_mels))
    params = model.init(jax.random.PRNGKey(0), mel,
                        jnp.full((1,), 600, jnp.int32))
    toks, tlen = model.apply(params, mel, jnp.full((1,), 600, jnp.int32))
    assert int(tlen[0]) == 150
    assert toks.shape[1] == 150
