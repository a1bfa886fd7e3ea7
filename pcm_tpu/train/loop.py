"""The training loop harness: steps, alternation, checkpointing, validation.

Equivalent of the reference trainers' ``main()`` orchestration
(`train_pcm_lora_sd15.py:766-1384`): data feeding, D/G parity alternation for
adversarial recipes, checkpoint save/rotate/resume with kohya LoRA export,
periodic validation image grids, metrics logging.
"""

from __future__ import annotations

import dataclasses
import os
import signal
import threading
import time
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..lora.kohya import save_kohya_safetensors
from ..parallel.mesh import shard_batch
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import MetricsLogger
from .state import TrainState


def _is_committed(x) -> bool:
    """Whether a jax.Array is committed to its devices (explicitly placed /
    mesh-sharded) as opposed to floating on the process-default device.

    Uses the private ``_committed`` flag when present (tests/test_checkpoint.py
    asserts it exists, so a jax upgrade that renames it fails loudly instead of
    silently flipping resume behavior — round-3 ADVICE). The public fallback
    treats single-default-device placement as uncommitted; misclassifying a
    committed default-device array is benign — the leaf is demoted to host
    numpy and the first jitted step re-places it identically."""
    c = getattr(x, "_committed", None)
    if c is not None:
        return bool(c)
    try:
        devs = x.sharding.device_set
    except AttributeError:
        return True
    return len(devs) != 1 or next(iter(devs)) != jax.local_devices()[0]


@dataclasses.dataclass
class LoopConfig:
    output_dir: str
    max_train_steps: int
    checkpointing_steps: int = 500
    checkpoints_total_limit: Optional[int] = 5
    validation_steps: int = 500
    log_every: int = 10
    seed: int = 42
    resume: bool = True
    kohya_prefix: str = "lora_unet"
    lora_alpha: float = 8.0
    # failure detection (SURVEY.md §5 — the reference has none): abort with a
    # clear error when the loss goes NaN/inf. Checked at log_every boundaries
    # only — a per-step readback would fence the device every step (~60 ms on
    # the remote backend) and serialize dispatch.
    abort_on_nonfinite: bool = True
    # preemption safety (the reference has none — a SIGTERM'd run loses up to
    # `checkpointing_steps` of work): catch SIGTERM/SIGINT, finish the
    # in-flight step, checkpoint, and return cleanly so `resume=True` picks
    # up at the exact step on restart.
    save_on_preemption: bool = True


class Trainer:
    """Drives consistency-only or adversarial training to completion."""

    def __init__(
        self,
        loop_cfg: LoopConfig,
        frozen: Dict[str, Any],
        g_state: TrainState,
        step_fn: Callable = None,
        adv_steps: Optional[tuple] = None,  # (g_step, d_step)
        pair_step: Optional[Callable] = None,  # fused D+G (adv.py fused pair)
        d_state: Optional[TrainState] = None,
        mesh=None,
        validation_fn: Optional[Callable] = None,
    ):
        self.cfg = loop_cfg
        self.frozen = frozen
        self.g_state = g_state
        self.d_state = d_state
        self.mesh = mesh
        self.validation_fn = validation_fn
        self.adversarial = adv_steps is not None or pair_step is not None
        self._pair = None
        if pair_step is not None:
            # fused pairing (build_*_adv_fused_pair): one batch -> one D + one
            # G update; counted as TWO global steps to keep the reference's
            # parity step accounting (checkpointing/max-steps cadences assume
            # one update per step — use even cadences with fused pairing)
            self._pair = jax.jit(pair_step, donate_argnums=(0, 1))
        elif self.adversarial:
            if len(adv_steps) == 3:
                # (g_step, feats_fn, update_fn) — split-D mode: the D step as
                # two smaller XLA programs, bit-identical to the monolithic
                # d_step (adv.py:build_ddim_adv_d_split; the monolithic
                # SDXL-1024 D graph can SIGKILL the remote compiler)
                g_step, feats_fn, update_fn = adv_steps
                # attributes (not closure locals) so _aot_warm can swap in
                # AOT-compiled executables under multi-process
                self._jf = jax.jit(feats_fn)
                self._ju = jax.jit(update_fn, donate_argnums=(0,))

                def d_step(g_state, d_state, frozen, batch, rng):
                    fake_feats, real_feats = self._jf(g_state, d_state, frozen, batch, rng)
                    return self._ju(d_state, fake_feats, real_feats)

                self._g_step = jax.jit(g_step, donate_argnums=(0,))
                self._d_step = d_step
            else:
                g_step, d_step = adv_steps
                self._g_step = jax.jit(g_step, donate_argnums=(0,))
                self._d_step = jax.jit(d_step, donate_argnums=(1,))
        else:
            self._step = jax.jit(step_fn, donate_argnums=(0,))

        self.logger = MetricsLogger(loop_cfg.output_dir)
        self.ckpt = CheckpointManager(
            os.path.join(loop_cfg.output_dir, "checkpoints"),
            max_to_keep=loop_cfg.checkpoints_total_limit,
        )
        self.global_step = 0
        self._stop_requested = False
        if loop_cfg.resume:
            self._try_resume()

    def request_stop(self):
        """Ask the loop to checkpoint and return after the in-flight step.

        Safe from any thread (and from the SIGTERM handler `run` installs
        when ``save_on_preemption``)."""
        self._stop_requested = True

    # -- checkpoint -------------------------------------------------------
    def _ckpt_state(self):
        state = {"g_state": self.g_state}
        if self.d_state is not None:
            state["d_state"] = self.d_state
        return state

    def _try_resume(self):
        template = self._ckpt_state()
        restored, step = self.ckpt.restore(template)
        if step is not None:
            # Restored leaves must be as movable as the template's: orbax
            # returns COMMITTED arrays, so when the template params were
            # host-initialized UNCOMMITTED cpu arrays (init_frozen_cpu) that
            # the first jitted TPU step would have auto-transferred, the
            # restored committed-cpu params instead kill that step with
            # "incompatible devices" (observed on a real single-chip resume,
            # .cache/logs/trainrun_leg2.out: params on CPU, state.step on
            # TPU). Committed templates (mesh-sharded states) keep their
            # sharding; uncommitted templates demote the restored leaf to
            # host numpy so jit places it exactly like the fresh state.
            def _replace(r, t):
                committed = isinstance(t, jax.Array) and _is_committed(t)
                if committed:
                    if isinstance(r, jax.Array) and r.sharding != t.sharding:
                        return jax.device_put(r, t.sharding)
                    return r
                if isinstance(r, jax.Array):
                    return np.asarray(jax.device_get(r))
                return r

            restored = jax.tree.map(_replace, restored, template)
            self.g_state = restored["g_state"]
            self.d_state = restored.get("d_state", self.d_state)
            self.global_step = int(step)

    def _save(self):
        self.ckpt.save(self.global_step, self._ckpt_state())
        if jax.process_index() == 0:
            lora_host = jax.device_get(self.g_state.params)
            path = os.path.join(
                self.cfg.output_dir, f"pcm_lora_{self.global_step:07d}.safetensors"
            )
            save_kohya_safetensors(
                path, lora_host, self.cfg.lora_alpha, prefix=self.cfg.kohya_prefix
            )

    # -- loop -------------------------------------------------------------
    def run(self, data_iter: Iterator[Dict], extra_batch_fn: Optional[Callable] = None,
            prefetch: int = 2):
        """``prefetch`` batches are prepped (asarray + extra_batch_fn +
        sharding) ahead of the step that consumes them, overlapping host
        assembly and the async H2D transfer with device compute — the JAX
        equivalent of the reference's pinned-memory dataloader workers."""
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)

        # Feeder-phase accounting (written by the feeder thread, read+reset at
        # log boundaries — float += under the GIL is tolerable for diagnostics):
        # feed_iter_s = waiting on the dataset/loader, feed_put_s = host->device
        # upload (jnp.asarray through the remote tunnel) + shard assembly.
        # The r3 trainrun showed the loop at device speed whenever the feeder
        # kept up and ~40 s/batch when it didn't; these split that 40 s.
        self._feed_iter_s = self._feed_put_s = 0.0

        def prepped():
            it = iter(data_iter)
            while True:
                _t0 = time.time()
                try:
                    b = next(it)
                except StopIteration:
                    return
                _t1 = time.time()
                b = {k: jnp.asarray(v) for k, v in b.items()}
                if extra_batch_fn is not None:
                    b = extra_batch_fn(b)
                if self.mesh is not None:
                    b = shard_batch(b, self.mesh)
                _t2 = time.time()
                self._feed_iter_s += _t1 - _t0
                self._feed_put_s += _t2 - _t1
                yield b

        from collections import deque

        # Preemption handler: only the main thread can set signal handlers,
        # and nested harnesses (tests, notebooks) may run this off-main —
        # degrade to request_stop()-only there.
        prev_handlers = {}
        if cfg.save_on_preemption and threading.current_thread() is threading.main_thread():
            def _on_signal(signum, frame):
                self.request_stop()

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_signal)

        batches = prepped()
        lookahead: deque = deque()
        if jax.process_count() > 1:
            # AOT-compile every step variant on the first batch, THEN align
            # processes: gloo's connect window (~30 s) opens at the first
            # collective EXECUTION, and per-process jit-compile skew on a
            # contended host exceeds it (observed Connect-timeout in
            # tests/test_multiprocess.py without this). The compiled
            # executables replace the jitted fns so the loop never recompiles.
            from ..parallel.mesh import barrier

            lookahead.append(next(batches))
            b0 = lookahead[0]
            if self._pair is not None:
                self._pair = self._pair.lower(
                    self.g_state, self.d_state, self.frozen, b0, rng
                ).compile()
            elif self.adversarial:
                self._g_step = self._g_step.lower(
                    self.g_state, self.d_state, self.frozen, b0, rng
                ).compile()
                # only the FIRST collective races the gloo connect window;
                # once the context exists, later jit compiles (e.g. _ju)
                # happen in lockstep at the collective that needs them
                if hasattr(self, "_jf"):
                    self._jf = self._jf.lower(
                        self.g_state, self.d_state, self.frozen, b0, rng
                    ).compile()
                else:
                    self._d_step = self._d_step.lower(
                        self.g_state, self.d_state, self.frozen, b0, rng
                    ).compile()
            else:
                self._step = self._step.lower(
                    self.g_state, self.frozen, b0, rng
                ).compile()
            barrier("pcm_first_step")

        # Background feeder: batch prep (collate output -> asarray H2D ->
        # shard) runs off the main thread so the upload (~2 s/batch through
        # the 13 MB/s remote tunnel, measured) overlaps device compute
        # instead of serializing with the step dispatch. ``prefetch`` bounds
        # the queue so the feeder stays at most that many batches ahead.
        import queue as queue_mod

        feed_q: queue_mod.Queue = queue_mod.Queue(maxsize=max(prefetch, 1))
        feed_stop = threading.Event()
        _END = object()

        def _put(item) -> bool:
            """Bounded put that gives up once the consumer has stopped."""
            while not feed_stop.is_set():
                try:
                    feed_q.put(item, timeout=0.5)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def _feeder():
            try:
                for b in batches:
                    if not _put(b):
                        return
            except BaseException as e:  # re-raised on the consumer side
                _put(("__feeder_error__", e))
                return
            _put(_END)

        threading.Thread(target=_feeder, daemon=True, name="pcm-batch-feeder").start()

        def _next_batch():
            if lookahead:  # the multi-process AOT-compile batch
                return lookahead.popleft()
            item = feed_q.get()
            if item is _END:
                raise StopIteration("data iterator exhausted before max_train_steps")
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__feeder_error__":
                raise item[1]
            return item

        try:
            self._run_steps(cfg, rng, _next_batch)
        finally:
            feed_stop.set()  # unblocks the feeder within its 0.5 s put timeout
        if self._stop_requested and (
            not cfg.checkpointing_steps
            or self.global_step % cfg.checkpointing_steps != 0
        ):
            self.logger.log(self.global_step, {"preempted": 1.0})
        self._save()
        self.ckpt.wait()
        if jax.process_count() > 1:
            # align exits: process-0-only tail work (kohya export, image
            # logging) must not push process 0 past the coordination
            # service's Shutdown-barrier window while the others exit
            from ..parallel.mesh import barrier

            barrier("pcm_run_done")
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        return self.g_state, self.d_state

    def _run_steps(self, cfg, rng, _next_batch):
        t_last = time.time()
        # host-phase accounting per log window: where wall time actually goes
        # (data wait vs dispatch vs metric readback fence). The remote
        # backend's per-step costs are invisible to device-side timing — the
        # r3 trainrun measured 33-60 s/step against a 634 ms fenced device
        # step, and these counters are how that gap gets attributed.
        t_data = t_dispatch = 0.0
        while self.global_step < cfg.max_train_steps and not self._stop_requested:
            _t0 = time.time()
            batch = _next_batch()
            _t1 = time.time()
            t_data += _t1 - _t0

            step_inc = 1
            if self._pair is not None:
                self.g_state, self.d_state, metrics = self._pair(
                    self.g_state, self.d_state, self.frozen, batch, rng
                )
                step_inc = 2  # one D + one G update (reference parity counting)
            elif self.adversarial and self.global_step % 2 == 0:
                # even parity trains D (ref `train_pcm_lora_sd15_adv.py:1374`)
                self.d_state, metrics = self._d_step(
                    self.g_state, self.d_state, self.frozen, batch, rng
                )
            elif self.adversarial:
                self.g_state, metrics = self._g_step(
                    self.g_state, self.d_state, self.frozen, batch, rng
                )
            else:
                self.g_state, metrics = self._step(self.g_state, self.frozen, batch, rng)
            t_dispatch += time.time() - _t1

            self.global_step += step_inc
            if self.global_step % cfg.log_every == 0:
                from .prodigy import prodigy_d

                d = prodigy_d(self.g_state.opt_state)
                if d is not None:
                    metrics = dict(metrics, prodigy_d=d)
                _tf = time.time()
                metrics = dict(metrics)
                metrics = {k: float(v) for k, v in metrics.items()}  # readback fence
                now = time.time()
                metrics["steps_per_sec"] = cfg.log_every / (now - t_last)
                metrics["host_data_s"] = round(t_data, 3)
                metrics["host_dispatch_s"] = round(t_dispatch, 3)
                metrics["fence_s"] = round(now - _tf, 3)
                metrics["feed_iter_s"] = round(self._feed_iter_s, 3)
                metrics["feed_put_s"] = round(self._feed_put_s, 3)
                self._feed_iter_s = self._feed_put_s = 0.0
                t_data = t_dispatch = 0.0
                t_last = now
                self.logger.log(self.global_step, metrics)
                if cfg.abort_on_nonfinite:
                    bad = {
                        k: float(v) for k, v in metrics.items()
                        if k in ("loss", "d_loss", "g_loss")
                        and not np.isfinite(float(v))
                    }
                    if bad:
                        raise FloatingPointError(
                            f"non-finite loss at step {self.global_step}: {bad} "
                            f"(last checkpoint: step "
                            f"{self.global_step - self.global_step % cfg.checkpointing_steps if cfg.checkpointing_steps else 0})"
                        )

            if cfg.checkpointing_steps and self.global_step % cfg.checkpointing_steps == 0:
                self._save()

            if (self.validation_fn is not None and cfg.validation_steps
                    and self.global_step % cfg.validation_steps == 0):
                images = self.validation_fn(self.frozen, self.g_state.params, self.global_step)
                if isinstance(images, dict):
                    # tagged grids, e.g. one per guidance scale — mirrors the
                    # reference's two log_validation calls at cfg 1 and 7.5
                    # (`train_pcm_lora_sd15.py:1346-1365`)
                    for tag, imgs in images.items():
                        self.logger.log_images(self.global_step, f"validation/{tag}", imgs)
                elif images is not None:
                    self.logger.log_images(self.global_step, "validation", images)
