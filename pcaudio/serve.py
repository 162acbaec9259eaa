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

    def classify_paths(self, paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Decode WAV files and classify, overlapping host decode of upcoming
        batches with device compute — the production ingest path the
        reference's per-clip ``librosa.load`` loop can't do
        (``Code/settransformer.py:43-47``).

        Decode rides the native C++ prefetch pipeline when the toolchain is
        available (``pcaudio/native``: thread-pool into a ring of slot
        buffers, several batches in flight); otherwise a Python producer
        thread with the threaded batch decoder."""
        from pcaudio import native

        if native.available():
            gen = self._native_batches(paths)
        else:
            gen = self._python_batches(paths)
        # Keep a small in-flight window of async device results: enough that
        # the host never blocks on the device between dispatches, bounded so
        # device buffers don't accumulate with the length of the path list.
        # H2D is double-buffered: batch t's device_put is issued (async)
        # BEFORE blocking on batch t-W's result, so the copy engine runs
        # under the in-flight compute instead of after it.
        window: List = []
        done: List[np.ndarray] = []
        MAX_IN_FLIGHT = 4
        for waves, lengths, n in gen:
            dw = jax.device_put(waves)
            dl = jax.device_put(lengths)
            if len(window) >= MAX_IN_FLIGHT:
                o, m = window.pop(0)
                done.append(np.asarray(o)[:m])
            out = self._fn(self.params, dw, dl)
            window.append((out, n))  # dispatch is async; don't block here
        done.extend(np.asarray(o)[:n] for o, n in window)
        lg = np.concatenate(done, axis=0)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(lg), axis=-1))
        return np.argmax(lg, axis=-1), probs

    def _native_batches(self, paths: Sequence[str]):
        """Batches via the C++ prefetch pipeline (depth batches in flight)."""
        from pcaudio.native import PrefetchingLoader

        groups = [list(paths[i: i + self.batch_size])
                  for i in range(0, len(paths), self.batch_size)]
        DEPTH = 3
        with PrefetchingLoader(self.buffer_len, self.batch_size,
                               depth=DEPTH) as pf:
            submitted = 0
            for submitted in range(min(DEPTH, len(groups))):
                pf.submit(groups[submitted])
            submitted += 1 if groups else 0
            for gi, group in enumerate(groups):
                waves, lengths, n = pf.next()
                # materialize out of the slot: the consumer's device dispatch
                # is async and jnp.asarray may alias host memory (CPU
                # backend), so the view must not outlive the slot recycle
                waves = waves.copy()
                lengths = np.maximum(lengths, 1)  # floor for padded rows
                yield waves, lengths, n
                if submitted < len(groups):
                    pf.submit(groups[submitted])
                    submitted += 1

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
