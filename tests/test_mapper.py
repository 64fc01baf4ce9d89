"""Mapper: numeric parity against a torch implementation of the reference
architecture (pre-norm transformer, fused-KV attention, ReLU MLP ratio 2.0 —
/root/reference/clipcap/model/mapper.py:113-160, attention.py:17-41), plus
checkpoint-import round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipcap_tpu.models.mapper import (
    MapperConfig,
    init_mapper,
    mapper_apply,
    mapper_params_from_torch,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# --- torch fixture model: independent re-statement of the documented
# reference-mapper semantics, used only to generate golden outputs. ---
class _Attn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.to_queries = nn.Linear(dim, dim, bias=False)
        self.to_keys_values = nn.Linear(dim, dim * 2, bias=False)
        self.project = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        q = self.to_queries(x).reshape(b, n, self.h, c // self.h)
        kv = self.to_keys_values(x).reshape(b, n, 2, self.h, c // self.h)
        k, v = kv[:, :, 0], kv[:, :, 1]
        a = torch.einsum("bnhd,bmhd->bnmh", q, k) * (c // self.h) ** -0.5
        a = a.softmax(dim=2)
        out = torch.einsum("bnmh,bmhd->bnhd", a, v).reshape(b, n, c)
        return self.project(out)


class _Layer(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=2.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _Attn(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.fc2(F.relu(self.fc1(self.norm2(x))))
        return x


class _TorchMapper(nn.Module):
    def __init__(self, enc_dim, lm_dim, prefix_len, proj_len, heads, layers,
                 window_size=None, use_pos=False):
        super().__init__()
        self.proj_len = proj_len
        self.window_size = window_size
        n_proj = proj_len if window_size is None else window_size * proj_len
        self.n_proj = n_proj
        self.linear = nn.Linear(enc_dim, proj_len * lm_dim)
        self.prefix_const = nn.Parameter(torch.randn(prefix_len, lm_dim))
        self.layers = nn.ModuleList([_Layer(lm_dim, heads) for _ in range(layers)])
        self.pos_embeddings = (
            nn.Parameter(torch.randn(n_proj, lm_dim)) if (window_size and use_pos) else None
        )

    def forward(self, x):
        x = self.linear(x).view(x.shape[0], self.n_proj, -1)
        if self.pos_embeddings is not None:
            x = x + self.pos_embeddings.unsqueeze(0)
        prefix = self.prefix_const.unsqueeze(0).expand(x.shape[0], -1, -1)
        x = torch.cat((x, prefix), dim=1)
        for layer in self.layers:
            x = layer(x)
        return x[:, self.n_proj:]


def _rename_for_import(sd):
    """Map the fixture's param names onto the reference checkpoint layout
    that mapper_params_from_torch expects."""
    out = {}
    for k, v in sd.items():
        k2 = k
        for a, b in [("layers.", "transformer.layers."),
                     (".attn.", ".attn."), (".fc1.", ".mlp.fc1."), (".fc2.", ".mlp.fc2.")]:
            k2 = k2.replace(a, b)
        out["transformer_mapper." + k2] = v
    return out


@pytest.mark.parametrize("windowed,use_pos", [(False, False), (True, True), (True, False)])
def test_mapper_parity(windowed, use_pos):
    torch.manual_seed(0)
    enc_dim, lm_dim, prefix_len, proj_len, heads, layers = 24, 16, 5, 4, 4, 3
    window = 3 if windowed else None

    tm = _TorchMapper(enc_dim, lm_dim, prefix_len, proj_len, heads, layers,
                      window_size=window, use_pos=use_pos).eval()

    cfg = MapperConfig(
        encoder_embedding_size=enc_dim, lm_embedding_size=lm_dim,
        prefix_length=prefix_len, projection_length=proj_len,
        num_heads=heads, num_layers=layers,
        window_size=window, use_pos_embeddings=use_pos,
    )
    params = mapper_params_from_torch(_rename_for_import(tm.state_dict()), cfg)

    rng = np.random.default_rng(0)
    if windowed:
        x = rng.normal(size=(2, window, enc_dim)).astype(np.float32)
    else:
        x = rng.normal(size=(2, enc_dim)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    ours = np.asarray(mapper_apply(params, cfg, jnp.asarray(x), dtype=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST))
    assert ours.shape == (2, prefix_len, lm_dim)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_init_and_apply_shapes():
    cfg = MapperConfig(encoder_embedding_size=512, lm_embedding_size=64,
                       prefix_length=10, projection_length=10, num_heads=8, num_layers=2)
    params = init_mapper(cfg, seed=0)
    out = mapper_apply(params, cfg, jnp.zeros((3, 512)))
    assert out.shape == (3, 10, 64)
