"""CheckpointManager rotation + latest-resume (reference semantics:
`checkpoints_total_limit` rotation and `--resume_from_checkpoint latest`,
`train_pcm_lora_sd15.py:1081-1105,1308-1343`)."""

import os

import jax.numpy as jnp
import numpy as np

from pcm_tpu.utils.checkpoint import CheckpointManager


def _state(v):
    return {"params": {"w": jnp.full((3,), float(v))}, "step": jnp.int32(v)}


def test_rotation_and_latest_resume(tmp_path):
    d = str(tmp_path / "ckpts")
    mgr = CheckpointManager(d, max_to_keep=2, async_save=False)
    for s in (2, 4, 6):
        mgr.save(s, _state(s))
    mgr.wait()
    assert mgr.latest_step() == 6
    kept = sorted(int(x) for x in os.listdir(d) if x.isdigit())
    assert kept == [4, 6]  # max_to_keep=2 rotated step 2 away

    restored, step = mgr.restore(_state(0))
    assert step == 6
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 6.0)
    # explicit older step still restorable
    restored4, step4 = mgr.restore(_state(0), step=4)
    assert step4 == 4
    np.testing.assert_allclose(np.asarray(restored4["params"]["w"]), 4.0)
    mgr.close()

    # fresh manager over the same dir discovers latest (crash-resume path)
    mgr2 = CheckpointManager(d, max_to_keep=2, async_save=False)
    assert mgr2.latest_step() == 6
    mgr2.close()


def test_restore_empty_dir_returns_template(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "none"), async_save=False)
    template = _state(1)
    out, step = mgr.restore(template)
    assert step is None and out is template
    mgr.close()


def test_jax_array_committed_flag_still_exists():
    """Trainer._try_resume keys its resume re-placement on jax.Array's private
    ``_committed`` flag (train/loop.py:_is_committed). jax is unpinned; if an
    upgrade renames the attribute the public fallback takes over silently —
    this test makes the rename loud so the fallback gets re-validated against
    the real resume path (round-3 ADVICE, medium)."""
    import jax
    import jax.numpy as jnp

    from pcm_tpu.train.loop import _is_committed

    uncommitted = jnp.ones((2,))  # eager op on the default device
    committed = jax.device_put(jnp.ones((2,)), jax.local_devices()[0])
    assert getattr(uncommitted, "_committed", None) is not None, (
        "jax.Array._committed disappeared — re-validate loop._is_committed's "
        "public fallback against a real single-chip resume before trusting it"
    )
    assert not _is_committed(uncommitted)
    assert _is_committed(committed)
