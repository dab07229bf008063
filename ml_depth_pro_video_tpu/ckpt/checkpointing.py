"""Training-state checkpointing (orbax).

The reference only ever READS a model checkpoint (`depth_pro.py:134-149`,
SURVEY §5); this framework also trains, so it needs a writer: orbax
checkpoints of the full TrainState (params, optimizer moments, step)
with save/restore/latest-step management, usable under pjit shardings.
"""

from __future__ import annotations

import os

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(directory: str, state, step: int | None = None,
                     max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    step = int(state.step) if step is None else step
    if mgr.latest_step() == step:
        return  # already saved (orbax raises StepAlreadyExistsError)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(directory: str) -> int | None:
    mgr = _manager(directory)
    return mgr.latest_step()


def restore_train_state(directory: str, abstract_state, step: int | None = None):
    """Restore into the structure/shardings of ``abstract_state``
    (pass a concrete example state or jax.eval_shape output)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        return None
    target = jax.tree.map(lambda x: x, abstract_state)
    return mgr.restore(step, args=ocp.args.StandardRestore(target))
