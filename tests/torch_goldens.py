"""Golden-model generators: the reference architectures expressed with raw
``torch.nn.functional`` calls against a torch-named state dict.

These functions implement the *documented math* of the reference models (see
SURVEY.md section 2.1 and the docstrings in ``sequoia_tpu/models/*``) so that
the JAX implementations and the state-dict converters can both be validated
against torch numerics without vendoring the reference's module code.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def make_torch_sd(rng: torch.Generator, shapes: dict[str, tuple]) -> dict[str, torch.Tensor]:
    """Random state dict; linear weights ~ U(-1/sqrt(fan_in), ..), LN = affine-ish noise."""
    sd = {}
    for name, shape in shapes.items():
        if name.endswith("norm.weight") or ".0.weight" in name and "net" in name:
            t = 1.0 + 0.1 * torch.randn(shape, generator=rng)
        else:
            fan_in = shape[-1] if len(shape) > 1 else max(shape[0], 1)
            bound = 1.0 / math.sqrt(fan_in)
            t = torch.empty(shape).uniform_(-bound, bound, generator=rng)
        sd[name] = t.double()
    return sd


# ---------------------------------------------------------------------------
# ViS golden
# ---------------------------------------------------------------------------

def vis_shapes(G, D, depth, H, df, ds, dc, N) -> dict[str, tuple]:
    shapes = {"pos_emb1D": (N, D)}
    for i in range(depth):
        for h in range(H):
            m = f"transformer.layers.{i}.0.mixers.{h}."
            shapes[m + "local_norm.weight"] = (df,)
            shapes[m + "local_norm.bias"] = (df,)
            shapes[m + "summary_norm.weight"] = (ds,)
            shapes[m + "summary_norm.bias"] = (ds,)
            shapes[m + "s.weight"] = (ds, D)
            shapes[m + "s.bias"] = (ds,)
            shapes[m + "f.weight"] = (df, D)
            shapes[m + "f.bias"] = (df,)
            shapes[m + "c.weight"] = (dc, df + ds)
            shapes[m + "c.bias"] = (dc,)
        shapes[f"transformer.layers.{i}.0.projection.weight"] = (D, H * dc)
        shapes[f"transformer.layers.{i}.0.projection.bias"] = (D,)
        ff = f"transformer.layers.{i}.1.net."
        shapes[ff + "0.weight"] = (D,)
        shapes[ff + "0.bias"] = (D,)
        shapes[ff + "1.weight"] = (D, D)
        shapes[ff + "1.bias"] = (D,)
        shapes[ff + "3.weight"] = (D, D)
        shapes[ff + "3.bias"] = (D,)
    shapes["linear_head.0.weight"] = (D,)
    shapes["linear_head.0.bias"] = (D,)
    shapes["linear_head.1.weight"] = (G, D)
    shapes["linear_head.1.bias"] = (G,)
    return shapes


def vis_forward(sd, x: torch.Tensor, depth: int, H: int, df: int, ds: int) -> torch.Tensor:
    """x: (B, N, D) -> (B, G), the reference ViS math."""
    x = x + sd["pos_emb1D"]
    for i in range(depth):
        outs = []
        for h in range(H):
            m = f"transformer.layers.{i}.0.mixers.{h}."
            loc = F.linear(x, sd[m + "f.weight"], sd[m + "f.bias"])
            loc = F.gelu(F.layer_norm(loc, (df,), sd[m + "local_norm.weight"],
                                      sd[m + "local_norm.bias"]))
            ts = F.linear(x, sd[m + "s.weight"], sd[m + "s.bias"]).mean(dim=1)
            ts = F.gelu(F.layer_norm(ts, (ds,), sd[m + "summary_norm.weight"],
                                     sd[m + "summary_norm.bias"]))
            ts = ts.unsqueeze(1).expand(-1, x.shape[1], -1)
            outs.append(F.gelu(F.linear(torch.cat([loc, ts], dim=-1),
                                        sd[m + "c.weight"], sd[m + "c.bias"])))
        p = f"transformer.layers.{i}.0."
        attn = F.linear(torch.cat(outs, dim=-1), sd[p + "projection.weight"],
                        sd[p + "projection.bias"])
        x = attn + x
        ff = f"transformer.layers.{i}.1.net."
        y = F.layer_norm(x, (x.shape[-1],), sd[ff + "0.weight"], sd[ff + "0.bias"])
        y = F.gelu(F.linear(y, sd[ff + "1.weight"], sd[ff + "1.bias"]))
        y = F.linear(y, sd[ff + "3.weight"], sd[ff + "3.bias"])
        x = x + y
    x = x.mean(dim=1)
    x = F.layer_norm(x, (x.shape[-1],), sd["linear_head.0.weight"], sd["linear_head.0.bias"])
    return F.linear(x, sd["linear_head.1.weight"], sd["linear_head.1.bias"])


# ---------------------------------------------------------------------------
# ViT golden
# ---------------------------------------------------------------------------

def vit_shapes(G, D, depth, H, dh, mlp, N) -> dict[str, tuple]:
    inner = H * dh
    shapes = {"pos_emb1D": (N, D)}
    for i in range(depth):
        a = f"transformer.layers.{i}.0."
        shapes[a + "norm.weight"] = (D,)
        shapes[a + "norm.bias"] = (D,)
        shapes[a + "to_qkv.weight"] = (3 * inner, D)
        shapes[a + "to_out.weight"] = (D, inner)
        ff = f"transformer.layers.{i}.1.net."
        shapes[ff + "0.weight"] = (D,)
        shapes[ff + "0.bias"] = (D,)
        shapes[ff + "1.weight"] = (mlp, D)
        shapes[ff + "1.bias"] = (mlp,)
        shapes[ff + "3.weight"] = (D, mlp)
        shapes[ff + "3.bias"] = (D,)
    shapes["linear_head.0.weight"] = (D,)
    shapes["linear_head.0.bias"] = (D,)
    shapes["linear_head.1.weight"] = (G, D)
    shapes["linear_head.1.bias"] = (G,)
    return shapes


def vit_forward(sd, x: torch.Tensor, depth: int, H: int, dh: int) -> torch.Tensor:
    x = x + sd["pos_emb1D"]
    B, N, D = x.shape
    for i in range(depth):
        a = f"transformer.layers.{i}.0."
        y = F.layer_norm(x, (D,), sd[a + "norm.weight"], sd[a + "norm.bias"])
        qkv = F.linear(y, sd[a + "to_qkv.weight"]).chunk(3, dim=-1)
        q, k, v = [t.reshape(B, N, H, dh).permute(0, 2, 1, 3) for t in qkv]
        attn = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, H * dh)
        x = F.linear(out, sd[a + "to_out.weight"]) + x
        ff = f"transformer.layers.{i}.1.net."
        y = F.layer_norm(x, (D,), sd[ff + "0.weight"], sd[ff + "0.bias"])
        y = F.gelu(F.linear(y, sd[ff + "1.weight"], sd[ff + "1.bias"]))
        x = x + F.linear(y, sd[ff + "3.weight"], sd[ff + "3.bias"])
    x = x.mean(dim=1)
    x = F.layer_norm(x, (D,), sd["linear_head.0.weight"], sd["linear_head.0.bias"])
    return F.linear(x, sd["linear_head.1.weight"], sd["linear_head.1.bias"])


# ---------------------------------------------------------------------------
# HE2RNA golden
# ---------------------------------------------------------------------------

def he2rna_shapes(D, layers, G) -> dict[str, tuple]:
    dims = [D] + list(layers) + [G]
    shapes = {}
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        shapes[f"conv{i}.weight"] = (dout, din, 1)
        shapes[f"conv{i}.bias"] = (dout,)
    return shapes


def he2rna_eval_forward(sd, x_btd: torch.Tensor, n_layers: int, ks) -> torch.Tensor:
    """Eval-mode forward (k-averaged, no dropout).

    ``x_btd``: (B, T, D) tile features; internally transposed to the
    reference's (B, D, T) conv layout.
    """
    x = x_btd.transpose(1, 2)  # (B, D, T)
    mask = (x.max(dim=1, keepdim=True).values > 0).to(x.dtype)

    scores = x
    for i in range(n_layers - 1):
        w = sd[f"conv{i}.weight"]
        scores = F.relu(F.conv1d(scores, w, sd[f"conv{i}.bias"]))
    w = sd[f"conv{n_layers - 1}.weight"]
    scores = F.conv1d(scores, w, sd[f"conv{n_layers - 1}.bias"])  # (B, G, T)
    scores = scores * mask

    pred = 0
    for k in ks:
        t, _ = torch.topk(scores, int(k), dim=2, largest=True, sorted=True)
        num = torch.sum(t * mask[:, :, :k], dim=2)
        den = torch.sum(mask[:, :, :k], dim=2)
        pred = pred + (num / den) / len(ks)
    return pred
