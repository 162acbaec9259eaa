"""pcaudio — a TPU-native (JAX / XLA / Pallas / pjit) framework for point-cloud
audio processing, with the capabilities of SubramaniKrishna/point-cloud-audio
(arXiv:2105.02469) re-designed TPU-first.

Subpackages:
  core        PointCloud pytree, typed configs, PRNG plumbing
  dsp         trim / resample / STFT featurization (JAX, librosa-compatible)
  data        ESC-50 metadata + seed-compatible split, ModelNet40, synthetic
  ops         batched point-cloud extraction & subsampling + Pallas kernels
  nn          masked MAB/SAB/ISAB/PMA + model zoo
  checkpoint  torch .pth importer, orbax save/load
  train       jitted train step, torch-Adam-equivalent optax, mesh DP
  eval        experiment harness emitting the reference JSON schemas
  bench       FLOPs calculator + throughput harness
  parallel    mesh construction and sharding helpers
"""

__version__ = "0.1.0"
