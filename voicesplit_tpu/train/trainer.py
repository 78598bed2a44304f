"""The training driver.

Capability of reference `train.py:25-163`: model selection from config,
Adam, checkpoint resume (full or partial warm-start), epoch loop with
validation at epoch start, per-batch step, loss-explosion guard,
summaries every `summary_interval`, checkpoint + validation every
`checkpoint_interval`.

TPU-native differences: the step is one jitted XLA program fed with
host-sharded waveform batches over a device mesh; the explosion guard
rides the metrics transfer (no extra sync); checkpoints carry the data-
iterator state for exact mid-epoch resume; throughput is reported as
audio-seconds/s/chip.

Preemption safety (new capability; the reference's only recovery is
manual resume, `train.py:40-60`): preemptible TPU slices get SIGTERM
with a grace window.  ``fit()`` installs handlers that request a stop;
the loop then checkpoints at the next step boundary and returns cleanly
with ``{"preempted": True}``, so the replacement job resumes mid-epoch
from the saved data-iterator state.  Multi-host runs agree on the flag
with a tiny allgather at summary_interval boundaries (a signal may
reach one host only, and ``_host_copy`` is collective).
"""

from __future__ import annotations

import os
import signal
import threading
import time
from typing import Dict, Optional

import jax
import numpy as np

from voicesplit_tpu.config import Config
from voicesplit_tpu.data.dataset import BatchIterator, train_dataloader, eval_dataloader
from voicesplit_tpu.dsp.processor import AudioProcessor, make_audio_processor
from voicesplit_tpu.eval.validation import validate
from voicesplit_tpu.models.masknet import make_masknet
from voicesplit_tpu.parallel.mesh import make_mesh
from voicesplit_tpu.parallel.sharding import put_batch, shard_train_state
from voicesplit_tpu.train.checkpoint import (
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from voicesplit_tpu.train.state import TrainState, create_train_state, make_optimizer
from voicesplit_tpu.train.steps import make_eval_step, make_train_step
from voicesplit_tpu.utils.logging import MetricsLogger


class Trainer:
    def __init__(
        self,
        config: Config,
        checkpoint_path: Optional[str] = None,
        log_dir: Optional[str] = None,
        mesh=None,
        model_parallel: int = 1,
        train_loader: Optional[BatchIterator] = None,
        eval_loader: Optional[BatchIterator] = None,
        enable_tb: bool = True,
        prefetch_depth: int = 2,
        debug_nans: bool = False,
        streaming: Optional[bool] = None,
        async_checkpoint: bool = True,
    ):
        self.config = config
        self.log_dir = log_dir or config.train_config.logs_path
        self.ap: AudioProcessor = make_audio_processor(config)
        # streaming=None follows the deployment geometry: a causal conv
        # stack pairs with the forward-only LSTM (the zero-lookahead
        # model, BASELINE config 5).  Pass streaming=False explicitly to
        # train causal convs under a BiLSTM head.
        self.streaming = config.model.causal if streaming is None else streaming
        self.model = make_masknet(config, streaming=self.streaming)
        if mesh is None:
            import math

            n_dev = len(jax.devices()) // model_parallel
            if jax.process_count() > 1:
                # Multi-host: the mesh MUST span every host's devices —
                # a truncated device list would give some hosts no
                # addressable mesh devices and kill put_batch.  So the
                # global batch has to divide over the full data axis.
                global_batch = config.train_config.batch_size * jax.process_count()
                if n_dev * model_parallel != len(jax.devices()):
                    raise ValueError(
                        f"model_parallel={model_parallel} must divide the "
                        f"global device count {len(jax.devices())}"
                    )
                if global_batch % n_dev != 0:
                    raise ValueError(
                        f"global batch {global_batch} (= per-host "
                        f"{config.train_config.batch_size} x {jax.process_count()} "
                        f"hosts) must be divisible by the data axis {n_dev}"
                    )
                data = n_dev
            else:
                # single host: data axis must divide the batch; use the
                # largest device count that does rather than failing
                data = math.gcd(config.train_config.batch_size, n_dev)
            if data * model_parallel < len(jax.devices()):
                print(
                    f" ! batch_size {config.train_config.batch_size} / model_parallel "
                    f"{model_parallel} — using a {data}x{model_parallel} mesh of "
                    f"{len(jax.devices())} devices"
                )
            mesh = make_mesh(
                data=data, model=model_parallel,
                devices=jax.devices()[: data * model_parallel],
            )
        self.mesh = mesh
        self.model_parallel = model_parallel > 1

        n_hosts = max(1, jax.process_count())
        if train_loader is None:
            from voicesplit_tpu.data.dataset import SeparationDataset, discover_samples
            from voicesplit_tpu.data.native_loader import make_train_iterator

            samples = discover_samples(config.dataset.train_dir, config.dataset.format)
            ds = SeparationDataset(samples, self.ap, config.audio.audio_len, config.model.emb_dim)
            train_loader = make_train_iterator(
                ds, config.train_config.batch_size, seed=config.train_config.seed,
                shard_id=jax.process_index(), num_shards=n_hosts,
                n_threads=max(2, config.train_config.num_workers),
            )
        self.train_loader = train_loader
        self.eval_loader = eval_loader or eval_dataloader(config, self.ap)

        tx = make_optimizer(config)
        T = self.ap.frames_for(int(self.ap.sample_rate * config.audio.audio_len))
        F = self.ap.num_freq
        B = config.train_config.batch_size
        state = create_train_state(config, self.model, jax.random.PRNGKey(config.train_config.seed), (B, T, F), tx)

        if checkpoint_path:
            payload = load_checkpoint(checkpoint_path)
            try:
                restored, data_state = restore_train_state(payload, state)
            except Exception as e:  # shape mismatch ⇒ partial warm start
                print(f" > Full restore failed ({e}); partial init")
                state, _ = restore_train_state(
                    payload, state, partial=True,
                    reinit_layers=config.train_config.reinit_layers,
                )
            else:
                # outside the except scope: a loader/data-state problem
                # must surface loudly, not silently discard a good full
                # restore (resetting step + Adam moments) as "mismatch"
                state = restored
                if data_state is not None:
                    self.train_loader.load_state(data_state)
                print(f" > Resumed checkpoint step {int(payload['step'])}")

        self.state: TrainState = shard_train_state(state, self.mesh, self.model_parallel)
        # NaN-triage mode: keep the pre-step state alive (no donation) and
        # check the guard every step so the failing (state, batch) pair can
        # be re-run unjitted under jax_debug_nans to NAME the first
        # NaN-producing op (SURVEY §5's jax_debug_nans row).
        self.debug_nans = debug_nans
        self.train_step = make_train_step(
            config, self.model, self.ap, tx, donate=not debug_nans
        )
        if debug_nans:
            from voicesplit_tpu.train.steps import _train_step_body

            self._unjitted_step = _train_step_body(config, self.model, self.ap, tx)
        self.eval_step = make_eval_step(config, self.model, self.ap)
        self.logger = MetricsLogger(
            self.log_dir, self.ap.sample_rate, enable_tb=enable_tb,
            enabled=jax.process_index() == 0,
        )
        self._audio_seconds_per_batch = (
            B * config.audio.audio_len * max(1, jax.process_count())
        )
        self._n_chips = len(jax.devices())
        self._prefetch_depth = prefetch_depth
        self._prefetch = None  # built lazily at fit() so checkpoint
        # restore above can rewind the loader before readahead starts
        self._preempt_requested = False
        from voicesplit_tpu.train.checkpoint import AsyncCheckpointer

        self._ckpt_writer = AsyncCheckpointer() if async_checkpoint else None

    # ------------------------------------------------------------------

    def request_preemption(self) -> None:
        """Ask ``fit()`` to checkpoint and return at the next step boundary."""
        self._preempt_requested = True

    def _handle_signal(self, signum, frame):  # noqa: ARG002 — signal API
        if self._preempt_requested:
            # second signal: the operator means it — escalate past the
            # graceful path (default KeyboardInterrupt semantics)
            raise KeyboardInterrupt
        # os.write is async-signal-safe; print() can die on the stdout
        # BufferedWriter lock if the signal lands mid-write (ADVICE r1)
        os.write(2, f" > Caught signal {signum}: checkpointing at next step boundary\n".encode())
        self.request_preemption()

    def _install_signal_handlers(self):
        """SIGTERM/SIGINT → graceful checkpoint-and-exit.

        Python only allows signal handlers on the main thread; inside a
        worker thread (tests, notebook executors) this is a no-op and
        `request_preemption()` remains the programmatic path.
        """
        if threading.current_thread() is not threading.main_thread():
            return []
        previous = []
        for signum in (signal.SIGTERM, signal.SIGINT):
            try:
                previous.append((signum, signal.signal(signum, self._handle_signal)))
            except (ValueError, OSError):  # non-main interpreter contexts
                pass
        return previous

    def _preempt_agreed(self) -> bool:
        """All-host agreement on the preemption flag (collective if multi-host)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray([self._preempt_requested])
            )
            return bool(np.any(flags))
        return self._preempt_requested

    def _put(self, batch: Dict[str, np.ndarray]):
        return put_batch(self.mesh, batch)

    def _locate_nan(self, state: TrainState, batch) -> str:
        """Re-run the failing step unjitted with `jax_debug_nans` and
        return a report naming the first NaN-producing op.

        `state` is the PRE-step state (kept alive because debug mode
        builds the step without buffer donation); eager mode checks every
        primitive's output, so the raised FloatingPointError's traceback
        points into the op that first produced a non-finite value.
        """
        import traceback

        print(" > debug_nans: re-running the failing step unjitted...")
        jax.config.update("jax_debug_nans", True)
        try:
            with jax.disable_jit():
                self._unjitted_step(state, batch)
        except FloatingPointError as e:
            tb = traceback.format_exc()
            print(tb)
            return f"{e}\n{tb}"
        finally:
            jax.config.update("jax_debug_nans", False)
        return (
            "no NaN reproduced unjitted (fp32 eager vs compiled bf16 — "
            "explosion is dtype/fusion-dependent; loss exceeded the guard "
            "threshold without a non-finite intermediate)"
        )

    def _host_copy(self, tree):
        """Host-local (numpy) copy of globally-sharded state.

        In multi-host runs EVERY process must call this (process_allgather
        is collective); once materialized, eval/checkpointing are purely
        process-local, so gating *those* to process 0 cannot deadlock the
        other hosts against a jit entered by one process only.
        """
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # tiled=True: global (cross-host sharded) arrays are reshard-
            # gathered to their full global value, shapes unchanged
            return multihost_utils.process_allgather(tree, tiled=True)
        return tree

    def _eval_vars(self):
        """(params, batch_stats) safe to feed process-local eval_step."""
        if jax.process_count() > 1:
            return self._host_copy((self.state.params, self.state.batch_stats))
        return self.state.params, self.state.batch_stats

    def _checkpoint(self, run_eval: bool, step: int, compute_sdr: bool, max_eval_items):
        """Collective host-copy + process-0 save (optionally + eval)."""
        data_state = (
            self._prefetch.state if self._prefetch is not None
            else self.train_loader.state
        )
        host_state = self._host_copy(self.state)  # collective
        if jax.process_index() == 0:
            if self._ckpt_writer is not None:
                # serialization + disk write overlap the next train steps;
                # fit() flushes the writer before returning
                path = self._ckpt_writer.save(
                    self.log_dir, host_state, self.config, data_state
                )
            else:
                path = save_checkpoint(self.log_dir, host_state, self.config, data_state)
            print(f"Saved checkpoint to: {path}")
            if run_eval:
                m = validate(
                    self.eval_step, host_state.params, host_state.batch_stats,
                    self.eval_loader, self.logger, step,
                    max_items=max_eval_items, compute_sdr=compute_sdr,
                )
                print(f" > Eval @ step {step}: {m}")

    def fit(
        self,
        max_steps: Optional[int] = None,
        validate_at_epoch_start: bool = True,
        compute_sdr_in_eval: bool = False,
        max_eval_items: Optional[int] = 8,
    ) -> Dict[str, float]:
        """Run the epoch loop; returns the last metrics."""
        c = self.config.train_config
        restore_handlers = self._install_signal_handlers()
        if self._prefetch is None and self._prefetch_depth > 0:
            from voicesplit_tpu.data.prefetch import DevicePrefetcher

            # assembles + device-places batches on a background thread so
            # host work and the H2D transfer overlap the device step
            self._prefetch = DevicePrefetcher(
                self.train_loader, depth=self._prefetch_depth, place=self._put
            )
        step = int(jax.device_get(self.state.step))
        last: Dict[str, float] = {}
        t_window = time.time()
        steps_in_window = 0
        multi_host = jax.process_count() > 1
        try:
            for epoch in range(c.epochs):
                if validate_at_epoch_start:
                    params, bstats = self._eval_vars()  # collective in multi-host
                    if jax.process_index() == 0:
                        m = validate(
                            self.eval_step, params, bstats,
                            self.eval_loader, self.logger, step,
                            max_items=max_eval_items, compute_sdr=compute_sdr_in_eval,
                        )
                        print(f" > Eval @ step {step}: {m}")
                for _ in range(self.train_loader.batches_per_epoch()):
                    if self._prefetch is not None:
                        batch = next(self._prefetch)
                    else:
                        batch = self._put(next(self.train_loader))
                    prev_state = self.state if self.debug_nans else None
                    self.state, metrics = self.train_step(self.state, batch)
                    step += 1
                    steps_in_window += 1

                    # Guard + multi-host agreement ride their own cadence
                    # (check_interval; every step in debug_nans mode) so a
                    # large summary_interval cannot delay explosion
                    # detection or outlast the preemption grace window.
                    check_every = 1 if self.debug_nans else max(1, c.check_interval)
                    do_summary = step % c.summary_interval == 0
                    do_check = do_summary or step % check_every == 0
                    if do_check:
                        m = jax.device_get(metrics)
                        loss = float(m["loss"])
                        if bool(m["loss_exploded"]):
                            print(f"Loss exploded to {loss:.2f} at step {step}!")
                            out = {"loss": loss, "exploded": True, "step": step}
                            if self.debug_nans:
                                out["nan_report"] = self._locate_nan(prev_state, batch)
                            return out
                    if do_summary:
                        dt = time.time() - t_window
                        tput = self._audio_seconds_per_batch * steps_in_window / max(dt, 1e-9)
                        t_window, steps_in_window = time.time(), 0
                        last = {
                            "loss": loss,
                            "grad_norm": float(m["grad_norm"]),
                            "audio_sec_per_sec_per_chip": tput / self._n_chips,
                        }
                        self.logger.log_training(loss, step, grad_norm=last["grad_norm"],
                                                 audio_sec_per_sec_per_chip=last["audio_sec_per_sec_per_chip"])

                    # Preemption: single-host checks the local flag every
                    # step (free); multi-host agrees via allgather only at
                    # check boundaries so the sync never paces the step.
                    if (not multi_host and self._preempt_requested) or (
                        multi_host and do_check and self._preempt_agreed()
                    ):
                        self._checkpoint(False, step, compute_sdr_in_eval, max_eval_items)
                        print(f" > Preempted: checkpointed at step {step}, exiting")
                        # clear the flag so a later fit() on this Trainer
                        # trains instead of instantly re-preempting, and a
                        # fresh SIGTERM gets the graceful path (ADVICE r1)
                        self._preempt_requested = False
                        last.update({"step": step, "preempted": True})
                        return last

                    if step % c.checkpoint_interval == 0:
                        self._checkpoint(True, step, compute_sdr_in_eval, max_eval_items)

                    if max_steps is not None and step >= max_steps:
                        if step % c.checkpoint_interval != 0:
                            # final state off an interval boundary would
                            # otherwise be silently dropped
                            self._checkpoint(False, step, compute_sdr_in_eval,
                                             max_eval_items)
                        last["step"] = step
                        return last
            if step > 0 and step % c.checkpoint_interval != 0:
                self._checkpoint(False, step, compute_sdr_in_eval, max_eval_items)
            last["step"] = step
            return last
        finally:
            if self._ckpt_writer is not None:
                # a graceful exit (preemption included) must not drop an
                # in-flight checkpoint write
                self._ckpt_writer.wait()
            for signum, handler in restore_handlers:
                signal.signal(signum, handler)
