"""Checkpointing with the reference's on-disk contract.

Reference: whole-model state_dict -> models/<name>/model_<k>.pt every
``save_every`` steps; resume picks max k by glob; architecture persisted
in .config.json and TRUSTED OVER CLI FLAGS on load
(histoGAN/histoGAN.py:806-825, 1107-1139).

Here: orbax checkpoints at models/<name>/model_<k>/ (atomic tmp+rename,
preemption-safe — TPU VMs preempt) holding the FULL training state
including both optimizer states (the reference silently loses optimizer
state on resume; documented improvement). Same .config.json contract.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, List, Optional

import orbax.checkpoint as ocp


class CheckpointStore:
    def __init__(self, models_dir, name: str):
        self.dir = Path(models_dir) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    @property
    def config_path(self) -> Path:
        return self.dir / ".config.json"

    def path(self, num: int) -> Path:
        return self.dir / f"model_{num}"

    def saved_nums(self) -> List[int]:
        out = []
        for p in self.dir.glob("model_*"):
            m = re.fullmatch(r"model_(\d+)", p.name)
            if m and p.is_dir():
                out.append(int(m.group(1)))
        return sorted(out)

    def save(self, state: Any, num: int) -> None:
        """Save. Under a multi-process cluster this MUST be called on
        EVERY process: orbax's Checkpointer.save runs an internal
        all-process sync ('Checkpointer:save_start'), so a process-0-only
        call deadlocks the cluster (found by
        tests/test_multihost.py::test_two_process_fsdp_checkpoint_roundtrip).
        orbax itself gates the actual file writes to process 0 for
        host-replicated trees."""
        import jax
        from flax import serialization

        path = self.path(num)
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        if jax.process_count() > 1:
            # the rmtree must complete before any process enters orbax
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_pre_save_{num}")
        # plain nested dicts on disk — stable across pytree definitions
        self._ckptr.save(path.absolute(), serialization.to_state_dict(state))

    def restore(self, num: int, template: Any) -> Any:
        from flax import serialization

        template_dict = serialization.to_state_dict(template)
        restore_args = ocp.checkpoint_utils.construct_restore_args(template_dict)
        restored = self._ckptr.restore(
            self.path(num).absolute(),
            restore_args=restore_args,
        )
        return serialization.from_state_dict(template, restored)

    def latest(self) -> Optional[int]:
        nums = self.saved_nums()
        return nums[-1] if nums else None

    def clear(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
        self.dir.mkdir(parents=True, exist_ok=True)
