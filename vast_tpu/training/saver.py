"""Checkpoint save/restore (orbax).

Reference behaviors (utils/save.py + utils/build_model.py:106-124):
save model/optimizer per ``valid_steps`` under ``<output>/ckpt`` as
``model_step_N`` / ``optimizer_step_N``, delete the previous pair unless
``remove_before_ckpt`` is false, keep ``best_<metric>`` copies when
``save_best``; resume picks the latest step and restores the optimizer
state + start step.
"""

from __future__ import annotations

import os
import re
import shutil

import jax
import orbax.checkpoint as ocp

from vast_tpu.logger import LOGGER


class ModelSaver:
    def __init__(self, output_dir: str, remove_before_ckpt: bool = True):
        self.ckpt_dir = os.path.abspath(os.path.join(output_dir, "ckpt"))
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.remove_before_ckpt = remove_before_ckpt
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, kind: str, step: int) -> str:
        return os.path.join(self.ckpt_dir, f"{kind}_step_{step}")

    def save(self, state, step: int, best_indicator: dict | None = None,
             save_best: bool = False):
        """Collective on pods: every host must call this (orbax writes
        each host's shards of mesh-sharded params); the best-copy /
        delete-previous filesystem surgery runs on host 0 only, after a
        barrier so no host is still reading what host 0 rewrites."""
        prev = self.latest_step()
        self._ckptr.save(self._path("model", step), state.params)
        self._ckptr.save(self._path("optimizer", step),
                         {"opt_state": state.opt_state, "step": state.step})
        self._ckptr.wait_until_finished()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"ckpt_saved_{step}")
        if jax.process_index() != 0:
            return
        if save_best and best_indicator:
            for metric, is_best in best_indicator.items():
                if is_best:
                    dst = os.path.join(self.ckpt_dir, f"best_{metric}")
                    if os.path.exists(dst):
                        shutil.rmtree(dst)
                    shutil.copytree(self._path("model", step), dst)
        if self.remove_before_ckpt and prev is not None and prev != step:
            for kind in ("model", "optimizer"):
                p = self._path(kind, prev)
                if os.path.exists(p):
                    shutil.rmtree(p)
        LOGGER.info("saved checkpoint step %d -> %s", step, self.ckpt_dir)

    def latest_step(self) -> int | None:
        steps = []
        if not os.path.isdir(self.ckpt_dir):
            return None
        for name in os.listdir(self.ckpt_dir):
            m = re.fullmatch(r"model_step_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def restore_params(self, step: int, like):
        return self._ckptr.restore(
            self._path("model", step), like)

    def restore_optimizer(self, step: int, like):
        return self._ckptr.restore(
            self._path("optimizer", step),
            {"opt_state": like.opt_state, "step": like.step})

    def restore_latest(self, state):
        """Resume: returns (state, start_step) (build_model.py:106-124)."""
        step = self.latest_step()
        if step is None:
            return state, 0
        params = self.restore_params(step, state.params)
        opt = self.restore_optimizer(step, state)
        LOGGER.info("resumed from step %d", step)
        return state.replace(params=params, opt_state=opt["opt_state"],
                             step=opt["step"]), step


def restore_params_from(path: str, like):
    """Explicit --checkpoint load (orbax dir or model_step_N dir)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def latest_model_dir(output_dir: str) -> str | None:
    """Newest ``<output_dir>/ckpt/model_step_N`` orbax dir, if any — the
    layout ModelSaver writes. Lets ``--pretrain_dir`` pick up weights
    from THIS framework's own pretrain output (the reference's
    finetune-from-own-pretrain chain, build_model.py:96-103, whose
    native format there is ``ckpt/model_step_N.pt``)."""
    ckpt_dir = os.path.join(output_dir, "ckpt")
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for name in os.listdir(ckpt_dir)
             if (m := re.fullmatch(r"model_step_(\d+)", name))
             and os.path.isdir(os.path.join(ckpt_dir, name))]
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"model_step_{max(steps)}")
