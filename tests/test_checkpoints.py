"""CheckpointManager: best-score policy, restart guard, resume."""

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.engine.checkpoints import CheckpointManager


def _state(v: float):
    return {"params": {"w": jnp.full((3,), v)}, "step": jnp.asarray(int(v))}


def test_save_if_best_and_restore(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    best = cm.save_if_best("dr", _state(1.0), epoch=0, score=0.5, prev_best=-np.inf)
    assert best == 0.5
    # worse score: not saved
    best = cm.save_if_best("dr", _state(2.0), epoch=1, score=0.4, prev_best=best)
    assert best == 0.5
    restored = cm.restore("dr", _state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)
    # better score: saved
    best = cm.save_if_best("dr", _state(3.0), epoch=2, score=0.9, prev_best=best)
    assert best == 0.9
    restored = cm.restore("dr", _state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.0)


def test_epoch_regression_guard(tmp_path):
    """A restarted run at an EARLIER epoch must not overwrite a newer best
    (ref utils.py:232-240 'prevent better model got covered during
    cluster rebooting')."""
    cm = CheckpointManager(str(tmp_path))
    cm.save_if_best("dr", _state(1.0), epoch=5, score=0.5, prev_best=-np.inf)
    # restarted cluster re-runs epoch 3 with a (spuriously) better score
    best = cm.save_if_best("dr", _state(9.0), epoch=3, score=0.8, prev_best=-np.inf)
    restored = cm.restore("dr", _state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)
    # the guard also reports the on-disk best as the watermark
    assert best == 0.5


def test_resume(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    cm.save_if_best("dr", _state(7.0), epoch=4, score=0.7, prev_best=-np.inf)
    cm.save_if_best("orb", _state(7.0), epoch=4, score=0.3, prev_best=-np.inf)
    state, start_epoch, bests = cm.resume(_state(0.0))
    assert start_epoch == 5
    assert bests["dr"] == 0.7
    assert bests["orb"] == 0.3
    assert bests["azure"] == 0.0
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 7.0)


def test_resume_fresh(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    state, start_epoch, bests = cm.resume(_state(0.0))
    assert start_epoch == 0 and bests["dr"] == 0.0


def test_latest_resume_beats_best(tmp_path):
    """A preempted run resumes from the LAST epoch, not the last best
    (VERDICT r1 #8): epochs after the best-dr save must not be lost."""
    cm = CheckpointManager(str(tmp_path))
    best = cm.save_if_best("dr", _state(5.0), epoch=2, score=0.9, prev_best=-np.inf)
    # three more epochs without a new best
    for e, v in [(3, 6.0), (4, 7.0), (5, 8.0)]:
        cm.save_latest(_state(v), e, {"dr": best})
    state, start_epoch, bests = cm.resume(_state(0.0))
    assert start_epoch == 6
    assert bests["dr"] == 0.9
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 8.0)


def test_struct_state_slim_roundtrip(tmp_path):
    """The production contract: a TrainState-like struct with
    params/batch_stats/step saves slim and restores field-by-field."""
    import flax.struct

    @flax.struct.dataclass
    class S:
        params: dict
        batch_stats: dict
        step: jnp.ndarray
        opt_state: dict

    def s(v):
        return S(
            params={"w": jnp.full((3,), v)},
            batch_stats={"mean": jnp.full((2,), v + 0.5)},
            step=jnp.asarray(int(v)),
            opt_state={"mu": jnp.full((3,), -v)},
        )

    cm = CheckpointManager(str(tmp_path))
    best = cm.save_if_best("dr", s(2.0), epoch=1, score=0.6, prev_best=-np.inf)
    assert best == 0.6
    restored = cm.restore("dr", s(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(restored.batch_stats["mean"]), 2.5)
    assert int(restored.step) == 2
    # slim checkpoint: optimizer state untouched (fresh target's kept)
    np.testing.assert_allclose(np.asarray(restored.opt_state["mu"]), 0.0)
    # resume() via best_dr works for struct states too
    state, start_epoch, bests = cm.resume(s(0.0))
    assert start_epoch == 2 and bests["dr"] == 0.6
    np.testing.assert_allclose(np.asarray(state.params["w"]), 2.0)


def test_latest_epoch_guard(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    cm.save_latest(_state(5.0), 5, {"dr": 0.1})
    cm.save_latest(_state(3.0), 3, {"dr": 0.1})  # restarted older run
    state, start_epoch, _ = cm.resume(_state(0.0))
    assert start_epoch == 6
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 5.0)
