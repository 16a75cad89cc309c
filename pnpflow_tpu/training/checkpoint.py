"""Orbax-backed train-state checkpointing (SURVEY §7: "orbax checkpoints
of {params, opt_state, ema, step}").

Production alternative to the msgpack path (training/flow_matching.py
save_preemption/restore_state): versioned step directories with a
retention policy, atomic finalization, async save (overlaps the next
training step), and latest-step auto-resume — the standard TPU-pod
checkpointing stack.  The msgpack path remains the default for its
single-file simplicity; select this with ``--opts ckpt_backend orbax``.
"""

from __future__ import annotations

import os

import jax
import numpy as np


class OrbaxCheckpointer:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager`` for the
    trainer's state dict {params, opt_state, ema, step} + epochs_done."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, state, epochs_done: int = 0, force: bool = False):
        """Async save keyed by the optimizer step counter."""
        payload = dict(jax.device_get(state))
        # orbax StandardSave rejects bare numpy scalars — use a 0-d array
        payload["epochs_done"] = np.asarray(epochs_done, np.int32)
        step = int(payload["step"])
        self.manager.save(
            step, args=self._ocp.args.StandardSave(payload), force=force
        )

    def restore_latest(self, template_state):
        """-> (state, epochs_done, resumed) against a template pytree."""
        step = self.manager.latest_step()
        if step is None:
            return template_state, 0, False
        template = dict(template_state)
        template["epochs_done"] = np.zeros((), np.int32)
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )
        epochs_done = int(restored.pop("epochs_done"))
        return restored, epochs_done, True

    def wait_until_finished(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
