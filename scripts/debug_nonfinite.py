"""Root-cause harness for non-finite gradients in full-net training.

Round-3 training silently skipped ~57% of optimizer updates
(Train/skipped_nonfinite_updates in the committed TB log). This script
reproduces training steps on the on-disk dofbot set and, for every step
whose total gradient is non-finite, re-runs backward once per loss term
to isolate the offender, then dumps forward-intermediate finiteness.

Usage: python scripts/debug_nonfinite.py [--steps 40] [--update]
  --update  actually apply optimizer updates (otherwise grads are probed
            at the initial weights every step)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

if "--tpu" not in sys.argv:
    os.environ["HRPE_FORCE_CPU"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.config import load_config
from hrpe_tpu.engine import losses as L
from hrpe_tpu.engine.train_state import assemble_gt
from hrpe_tpu.engine.trainer import Trainer, _pad_batch
from hrpe_tpu.parallel import shard_batch

TERMS = [
    "loss_joint", "loss_rot", "loss_uv", "loss_depth", "loss_trans",
    "loss_error2d", "loss_error3d", "loss_error2d_int", "loss_error3d_int",
    "loss_error3d_align",
]


def tree_nonfinite(tree):
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        n = np.size(a) - np.count_nonzero(np.isfinite(a))
        if n:
            bad.append((jax.tree_util.keystr(path), int(n), int(np.size(a))))
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/dofbot/full.yaml")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    cfg = load_config(args.config)
    if args.batch:
        cfg.batch_size = args.batch
    tr = Trainer(cfg, "full")
    state = tr.init_state()
    train_loader, _ = Trainer.__dict__ and __import__(
        "hrpe_tpu.engine.trainer", fromlist=["get_dataloaders"]
    ).get_dataloaders(cfg)

    model, robot, use_pnp = tr.model, tr.robot, tr.use_pnp

    def loss_term(params, batch_stats, batch, rng, term):
        gt_pose, _, gt_rot, k_vals = assemble_gt(cfg, batch, robot, use_pnp)
        variables = {"params": params, "batch_stats": batch_stats}
        out, _ = model.apply(
            variables,
            batch["other_images"].astype(jnp.float32) / 255.0,
            batch["root_images"].astype(jnp.float32) / 255.0,
            k_vals,
            batch["other_K"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        total, loss_dict = L.full_net_losses(cfg, out, batch, gt_rot, gt_pose)
        if term == "total":
            return total, (loss_dict, out)
        return loss_dict[term], (loss_dict, out)

    grad_total = jax.jit(
        jax.value_and_grad(lambda p, bs, b, r: loss_term(p, bs, b, r, "total"),
                           has_aux=True))
    grad_terms = {
        t: jax.jit(jax.value_and_grad(
            lambda p, bs, b, r, t=t: loss_term(p, bs, b, r, t), has_aux=True))
        for t in TERMS
    }

    rng = jax.random.PRNGKey(args.seed)
    n_bad = 0
    step_i = 0
    for epoch in range(10):
        for batch in train_loader:
            if step_i >= args.steps:
                break
            batch, _ = _pad_batch(batch, train_loader.local_batch_size)
            batch = shard_batch(tr.mesh, batch)
            rng, sub = jax.random.split(rng)
            if args.update:
                state, loss_dict = tr.step_fn(state, batch, sub)
                ok = np.isfinite(float(loss_dict["loss"]))
            (total, (loss_dict, out)), grads = grad_total(
                state.params, state.batch_stats, batch, sub)
            bad = tree_nonfinite(grads)
            fwd_bad = tree_nonfinite(dict(out))
            loss_vals = {k: float(v) for k, v in loss_dict.items()}
            nonfin_losses = [k for k, v in loss_vals.items() if not np.isfinite(v)]
            print(f"step {step_i}: total={float(total):.4g} "
                  f"grad_nonfinite_leaves={len(bad)} fwd_nonfinite={len(fwd_bad)} "
                  f"nonfinite_losses={nonfin_losses}")
            if bad or fwd_bad or nonfin_losses:
                n_bad += 1
                print("  losses:", {k: round(v, 4) for k, v in loss_vals.items()})
                if fwd_bad:
                    print("  forward nonfinite:", fwd_bad[:10])
                # isolate per loss term
                for t in TERMS:
                    (_, _), g = grad_terms[t](
                        state.params, state.batch_stats, batch, sub)
                    b = tree_nonfinite(g)
                    if b:
                        print(f"  TERM {t}: {len(b)} nonfinite leaves; first:",
                              b[:5])
                if n_bad >= 3:
                    print("three bad steps dissected; stopping")
                    return
            step_i += 1
        if step_i >= args.steps:
            break
    print(f"done: {n_bad} bad / {step_i} steps")


if __name__ == "__main__":
    main()
