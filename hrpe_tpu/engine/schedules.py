"""Learning-rate schedules (per-epoch factors) for optax.

Re-implementation of the reference's three LambdaLR lambdas
(lib/utils/utils.py:146-188): linear, exponential, everyXepoch, all with a
linear warmup prefix. The trainer evaluates `lr_factor` per epoch and
injects the product lr = base_lr * factor into the optimizer via
optax.inject_hyperparams — matching torch's epoch-granular LambdaLR
semantics exactly (including `last_epoch` resume behavior, which here is
just "pass the right epoch integer").
"""

from __future__ import annotations

import optax


def lr_factor(cfg, epoch: int) -> float:
    """Multiplicative factor on cfg.lr at `epoch` (0-based)."""
    if not cfg.use_schedule:
        return 1.0
    t = cfg.schedule_type
    if t == "linear":  # ref utils.py:148-157
        if epoch < cfg.n_epochs_warmup:
            return float(epoch + 1) / float(cfg.n_epochs_warmup)
        if epoch <= cfg.start_decay:
            return 1.0
        if epoch <= cfg.end_decay:
            return (
                float(cfg.end_decay - cfg.final_decay * cfg.start_decay)
                - float(1 - cfg.final_decay) * epoch
            ) / float(cfg.end_decay - cfg.start_decay)
        return cfg.final_decay
    if t == "exponential":  # ref utils.py:159-170
        if epoch < cfg.n_epochs_warmup:
            return float(epoch + 1) / float(cfg.n_epochs_warmup)
        if epoch <= cfg.start_decay:
            return 1.0
        if epoch <= cfg.end_decay:
            return cfg.exponent ** (epoch - cfg.start_decay)
        return cfg.exponent ** (cfg.end_decay - cfg.start_decay)
    if t == "everyXepoch":  # ref utils.py:172-176
        if epoch >= cfg.end_decay:
            return cfg.step_decay ** (cfg.end_decay // cfg.step)
        return cfg.step_decay ** (epoch // cfg.step)
    raise NotImplementedError(t)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam + grad clip, lr injected per-epoch by the trainer.

    Reference: Adam everywhere (train_full.py / train_depthnet.py), global
    grad-norm clip at cfg.clip_gradient (train_full.py:100-106).
    """
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(cfg.clip_gradient),
                optax.adamw(learning_rate, weight_decay=cfg.weight_decay)
                if cfg.weight_decay > 0
                else optax.adam(learning_rate),
            ),
            # skip (don't apply) any update containing inf/NaN gradients —
            # one bad batch must not poison the whole run. The reference's
            # detect_anomaly (train_depthnet.py:30) only DIAGNOSES; this
            # keeps production training alive. Error out after this many
            # consecutive bad steps.
            max_consecutive_errors=100,
        )
    )(learning_rate=cfg.lr)
    return tx
