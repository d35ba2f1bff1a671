"""Full train-step parity: our jitted MSE+AdamW step vs torch.optim.AdamW on
the float64 golden model — the end-to-end evidence for the 1e-3 budget."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from sequoia_tpu.models import convert, vis
from sequoia_tpu.train import loop
from tests import torch_goldens as tg


def test_vis_adamw_steps_match_torch():
    D, depth, H, G, N, B = 32, 2, 4, 12, 10, 4
    df = ds = dc = 8
    lr = 1e-3
    rng = torch.Generator().manual_seed(0)
    sd = tg.make_torch_sd(rng, tg.vis_shapes(G, D, depth, H, df, ds, dc, N))
    for v in sd.values():
        v.requires_grad_(True)

    xs = [torch.randn(B, N, D, generator=rng).double() for _ in range(3)]
    ys = [torch.randn(B, G, generator=rng).double() for _ in range(3)]

    # torch side: 3 AdamW steps (reference main.py optimizer settings)
    opt = torch.optim.AdamW(list(sd.values()), lr=lr, amsgrad=False,
                            weight_decay=0.0)
    for x, y in zip(xs, ys):
        opt.zero_grad()
        loss = torch.mean((tg.vis_forward(sd, x, depth, H, df, ds) - y) ** 2)
        loss.backward()
        opt.step()
    torch_final = {k: v.detach().numpy() for k, v in sd.items()}

    # our side: same initial weights, same batches, same optimizer settings
    rng2 = torch.Generator().manual_seed(0)
    sd0 = tg.make_torch_sd(rng2, tg.vis_shapes(G, D, depth, H, df, ds, dc, N))
    cfg, params = convert.vis_from_torch(sd0)

    optimizer = loop.make_adamw(lr)
    train_step, _ = loop.make_step_fns(
        lambda p, x: vis.apply(cfg, p, x), optimizer)
    opt_state = optimizer.init(params)
    valid = jnp.ones((B,), bool)
    for x, y in zip(xs, ys):
        params, opt_state, m = train_step(
            params, opt_state, jnp.asarray(x.detach().numpy(), jnp.float32),
            jnp.asarray(y.numpy(), jnp.float32), valid)

    ours = convert.vis_to_torch(cfg, jax.tree.map(np.asarray, params))
    for name in ["pos_emb1D", "linear_head.1.weight", "linear_head.1.bias",
                 "transformer.layers.0.0.mixers.1.f.weight",
                 "transformer.layers.1.0.projection.weight",
                 "transformer.layers.0.1.net.1.weight",
                 "transformer.layers.1.0.mixers.3.c.bias"]:
        a, b = ours[name], torch_final[name]
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)
        assert err < 5e-4, (name, err)
