"""Checkpoint save / rotate / resume via orbax.

Replaces the reference's ``accelerator.save_state`` + manual directory
rotation + ``--resume_from_checkpoint latest`` scan
(`train_pcm_lora_sd15.py:916-944,1081-1105,1308-1343`): orbax
CheckpointManager handles atomic async saves, max-to-keep rotation, and
latest-step discovery. Alongside each orbax step we also export the
kohya-format LoRA safetensors (the reference's release artifact).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if jax.process_count() > 1:
            # orbax's CheckpointManager init runs a cross-process sync that is
            # a DEVICE allgather — on the CPU backend it is the first gloo
            # collective of the program, and its ~30 s connect window loses to
            # per-process setup skew (observed in tests/test_multiprocess.py).
            # Align on the coordinator's KV store first.
            from ..parallel.mesh import barrier

            barrier("pcm_ckpt_mgr:" + self.directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            create=True,
            enable_async_checkpointing=async_save,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Dict[str, Any]):
        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template: Dict[str, Any], step: Optional[int] = None):
        """Restore into the structure of ``state_template``; returns
        (state, step) or (template, None) when no checkpoint exists."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state_template, None
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
