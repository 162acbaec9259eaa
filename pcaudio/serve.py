"""Production serving wrapper: checkpoint → batched wave→class classifier.

The reference has no serving story (eval scripts re-featurize with librosa on
the host per run).  ``AudioClassifier`` packages the whole fused pipeline
behind one call: fixed compiled batch shapes (requests padded to the bucket,
no recompiles), the fused Pallas ST kernel, and reference-checkpoint loading.

    clf = AudioClassifier.from_reference_checkpoint(cfg_json, pth)
    labels, probs = clf.classify(list_of_float32_clips)
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcaudio.core.config import ARCH_3ST, ARCH_FST, ExperimentConfig
from pcaudio.data.audio_io import pad_batch
from pcaudio.eval.pipeline import TemporalPipelineConfig, make_temporal_classifier


@dataclasses.dataclass
class AudioClassifier:
    """Batched end-to-end classifier for temporal (3ST-style) models."""

    model: object
    params: object
    pipeline: TemporalPipelineConfig
    batch_size: int = 64
    buffer_len: int = 220672  # 5 s at 44.1 kHz
    use_fused_st: bool = True
    # Host-staging / H2D dtype for classify_paths: "int16" ships raw PCM16
    # and converts on device (XLA) — half the host-memory traffic and half
    # the H2D bytes, bit-exact for 16-bit PCM sources (ESC-50's format;
    # librosa.load performs the identical /32768 conversion) and
    # round-clamped (≤ 2^-16 per sample) for wider/float WAVs.
    wave_dtype: str = "float32"

    def __post_init__(self):
        self._fn = jax.jit(
            make_temporal_classifier(
                self.model, self.pipeline, use_fused_st=self.use_fused_st
            )
        )

    @classmethod
    def from_reference_checkpoint(
        cls,
        config_json: str,
        pth_path: str,
        top_k: Optional[int] = 256,
        **kw,
    ) -> "AudioClassifier":
        cfg = ExperimentConfig.from_reference_json(config_json)
        assert cfg.architecture in (ARCH_FST, ARCH_3ST), (
            "serving pipeline targets the set-transformer models"
        )
        model = cfg.build_model()
        params = cfg.import_torch_checkpoint(pth_path)
        pipe = TemporalPipelineConfig(
            fs=cfg.sampling_rate,
            n_fft=cfg.window_size,
            hop_factor=cfg.hop_factor,
            num_frames=cfg.Ntemp or 10,
            top_db=cfg.trim_dB,
            top_k=top_k,
        )
        return cls(model=model, params=params, pipeline=pipe, **kw)

    @classmethod
    def from_orbax(cls, directory: str, top_k: Optional[int] = 256,
                   **kw) -> "AudioClassifier":
        from pcaudio.checkpoint.orbax_io import load_checkpoint

        tree, cfg, _ = load_checkpoint(directory)
        model = cfg.build_model()
        pipe = TemporalPipelineConfig(
            fs=cfg.sampling_rate, n_fft=cfg.window_size,
            hop_factor=cfg.hop_factor, num_frames=cfg.Ntemp or 10,
            top_db=cfg.trim_dB, top_k=top_k,
        )
        return cls(model=model, params=tree["params"], pipeline=pipe, **kw)

    def logits(self, clips: Sequence[np.ndarray]) -> np.ndarray:
        """Classify ragged float32 clips; pads to the compiled batch bucket
        so repeated calls never recompile.  Returns ``[len(clips), nclass]``."""
        outs: List[np.ndarray] = []
        for start in range(0, len(clips), self.batch_size):
            group = clips[start: start + self.batch_size]
            waves, lengths = pad_batch(group, self.buffer_len)
            n = len(group)
            if n < self.batch_size:  # pad request to the bucket
                waves = np.pad(waves, ((0, self.batch_size - n), (0, 0)))
                lengths = np.pad(lengths, (0, self.batch_size - n),
                                 constant_values=1)
            out = self._fn(self.params, jnp.asarray(waves), jnp.asarray(lengths))
            outs.append(np.asarray(out)[:n])
        return np.concatenate(outs, axis=0)

    def classify(
        self, clips: Sequence[np.ndarray]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns ``(predicted_labels [N], probabilities [N, nclass])``."""
        lg = self.logits(clips)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(lg), axis=-1))
        return np.argmax(lg, axis=-1), probs

    MAX_IN_FLIGHT = 4

    def classify_paths(self, paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Decode WAV files and classify, overlapping host decode of upcoming
        batches with device compute — the production ingest path the
        reference's per-clip ``librosa.load`` loop can't do
        (``Code/settransformer.py:43-47``).

        Decode rides the native C++ prefetch pipeline when the toolchain is
        available (``pcaudio/native``), ZERO-COPY: ``jax.device_put`` reads
        straight from the ring slot, which is released only after the
        batch's result materializes (the compute that produced it consumed
        the transfer first).  A host-side batch copy here measured 20 s per
        1024-clip batch on sandboxed kernels with ~100 µs first-touch page
        faults — buffer reuse is a correctness-of-scale concern, not a
        micro-optimization.  Without the toolchain, a Python producer
        thread with the threaded batch decoder."""
        from pcaudio import native

        lg = (self._classify_native(paths) if native.available()
              else self._classify_python(paths))
        probs = np.asarray(jax.nn.softmax(jnp.asarray(lg), axis=-1))
        return np.argmax(lg, axis=-1), probs

    def _loader(self):
        """The C++ ring loader, created once and reused across calls: its
        slot buffers are the ONLY large host allocations on the ingest
        path, and paying their first-touch page faults once matters on
        sandboxed kernels (~100 µs/page measured).  Each classify_paths
        call drains everything it submits, so reuse needs no reset."""
        from pcaudio.native import PrefetchingLoader

        dtype = np.int16 if self.wave_dtype == "int16" else np.float32
        pf = getattr(self, "_pf", None)
        if pf is None:
            pf = PrefetchingLoader(self.buffer_len, self.batch_size,
                                   depth=self.MAX_IN_FLIGHT + 2, dtype=dtype)
            self._pf = pf
        return pf

    def close(self) -> None:
        pf = getattr(self, "_pf", None)
        if pf is not None:
            pf.close()
            self._pf = None

    def _classify_native(self, paths: Sequence[str]) -> np.ndarray:
        groups = [list(paths[i: i + self.batch_size])
                  for i in range(0, len(paths), self.batch_size)]
        # slots: one per in-flight device batch + the one being dispatched
        # + one decode-ahead
        pf = self._loader()
        depth = self.MAX_IN_FLIGHT + 2
        window: List = []
        done: List[np.ndarray] = []
        submitted = 0
        for submitted in range(min(depth, len(groups))):
            pf.submit(groups[submitted])
        submitted += 1 if groups else 0
        for group in groups:
            waves, lengths, n = pf.acquire()
            dw = jax.device_put(waves)
            dl = jax.device_put(np.maximum(lengths, 1))
            if len(window) >= self.MAX_IN_FLIGHT:
                o, m = window.pop(0)
                done.append(np.asarray(o)[:m])
                pf.release()  # its input slot is consumed for certain
            out = self._fn(self.params, dw, dl)
            window.append((out, n))  # dispatch is async; don't block
            if submitted < len(groups):
                pf.submit(groups[submitted])
                submitted += 1
        for o, n in window:
            done.append(np.asarray(o)[:n])
            pf.release()
        return np.concatenate(done, axis=0)

    def _classify_python(self, paths: Sequence[str]) -> np.ndarray:
        window: List = []
        done: List[np.ndarray] = []
        for waves, lengths, n in self._python_batches(paths):
            dw = jax.device_put(waves)
            dl = jax.device_put(lengths)
            if len(window) >= self.MAX_IN_FLIGHT:
                o, m = window.pop(0)
                done.append(np.asarray(o)[:m])
            out = self._fn(self.params, dw, dl)
            window.append((out, n))
        done.extend(np.asarray(o)[:n] for o, n in window)
        return np.concatenate(done, axis=0)

    def _python_batches(self, paths: Sequence[str]):
        """Fallback: one Python producer thread + threaded batch decode."""
        import queue
        import threading

        from pcaudio.data.audio_io import load_wav_batch

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            try:
                for i in range(0, len(paths), self.batch_size):
                    group = paths[i: i + self.batch_size]
                    waves, lengths = load_wav_batch(group, self.buffer_len)
                    n = len(group)
                    if n < self.batch_size:
                        waves = np.pad(waves, ((0, self.batch_size - n), (0, 0)))
                        lengths = np.pad(lengths, (0, self.batch_size - n),
                                         constant_values=1)
                    q.put((waves, lengths, n))
            except Exception as e:  # surface decode errors to the consumer
                q.put(e)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                t.join()
                raise item
            yield item
        t.join()
