"""Import reference PyTorch checkpoints into flax parameter pytrees.

The reference ships five trained ``.pth`` state_dicts plus config JSONs in
``/root/reference/Code/model_saves/`` (save path ``Code/settransformer.py:153-162``).
Quirks handled here:

  * FST/3ST dicts carry the ``module.`` ``nn.DataParallel`` prefix; FB and
    CNN_temp don't (``Code/settransformer.py:94`` vs ``Code/baseline.py``);
  * torch ``nn.Linear`` stores ``weight`` as ``[out, in]`` — flax ``Dense``
    kernels are ``[in, out]``, so weights are transposed;
  * torch ``nn.LayerNorm`` ``weight``/``bias`` map to flax ``scale``/``bias``.

No torch dependency at module import time — ``.pth`` loading imports torch
lazily; all converters accept plain ``{name: np.ndarray}`` dicts.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

StateDict = Dict[str, np.ndarray]


def load_torch_state_dict(path: str) -> StateDict:
    """Load a ``.pth`` state_dict as numpy arrays (strips ``module.``)."""
    import torch  # lazy: only needed when actually importing .pth files

    sd = torch.load(path, map_location="cpu")
    return strip_module_prefix(
        {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}
    )


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> StateDict:
    """Strip the DataParallel ``module.`` prefix if present."""
    out = {}
    for k, v in sd.items():
        out[k[len("module."):] if k.startswith("module.") else k] = np.asarray(v)
    return out


def _dense(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
        "bias": sd[prefix + ".bias"],
    }


def _layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def mab_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """Convert one MAB block (``set_transformer-master/modules.py:6-17``)."""
    p: Dict[str, Any] = {
        "fc_q": _dense(sd, prefix + ".fc_q"),
        "fc_k": _dense(sd, prefix + ".fc_k"),
        "fc_v": _dense(sd, prefix + ".fc_v"),
        "fc_o": _dense(sd, prefix + ".fc_o"),
    }
    if prefix + ".ln0.weight" in sd:
        p["ln0"] = _layernorm(sd, prefix + ".ln0")
        p["ln1"] = _layernorm(sd, prefix + ".ln1")
    return p


def sab_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {"mab": mab_params(sd, prefix + ".mab")}


def isab_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "I": sd[prefix + ".I"],
        "mab0": mab_params(sd, prefix + ".mab0"),
        "mab1": mab_params(sd, prefix + ".mab1"),
    }


def pma_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {"S": sd[prefix + ".S"], "mab": mab_params(sd, prefix + ".mab")}


def st_params(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert the paper's ``ST`` model (``Code/models.py:13-44``)."""
    sd = strip_module_prefix(sd)
    return {
        "params": {
            "enc_0": isab_params(sd, "enc.0"),
            "enc_1": isab_params(sd, "enc.1"),
            "dec_pma": pma_params(sd, "dec.0"),
            "dec_out": _dense(sd, "dec.1"),
        }
    }


def baseline_ff_params(sd: Mapping[str, np.ndarray], num_hidden: int) -> Dict[str, Any]:
    """Convert ``baseline_ff`` (``Code/models.py:47-88``).

    ``num_hidden`` = number of Dense+LeakyReLU layers, i.e.
    ``len(layer_dims) - 1`` (2 for the shipped ``[1025, 513, 256]`` config).
    """
    sd = strip_module_prefix(sd)
    p: Dict[str, Any] = {
        f"enc_{i}": _dense(sd, f"ENC_NN.Encoder_Layer_{i}") for i in range(num_hidden)
    }
    p["code_linear"] = _dense(sd, "ENC_NN.Code_Linear")
    return {"params": p}


def cnn_classifier_params(sd: Mapping[str, np.ndarray], num_hidden: int) -> Dict[str, Any]:
    """Convert ``CNN_classifier`` (``Code/models.py:91-119``)."""
    sd = strip_module_prefix(sd)
    p: Dict[str, Any] = {
        "cnn_kernel": sd["cnn.weight"],  # [1, 1, Nt, kw] OIHW, used as-is
        "cnn_bias": sd["cnn.bias"],
    }
    for i in range(num_hidden):
        p[f"enc_{i}"] = _dense(sd, f"linear.Encoder_Layer_{i}")
    p["logits"] = _dense(sd, "linear.Logits")
    return {"params": p}


def deepset_params(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert ``DeepSet`` (``set_transformer-master/models.py:3-28``)."""
    sd = strip_module_prefix(sd)
    p: Dict[str, Any] = {}
    for i, j in enumerate((0, 2, 4, 6)):
        p[f"enc_{i}"] = _dense(sd, f"enc.{j}")
        p[f"dec_{i}"] = _dense(sd, f"dec.{j}")
    return {"params": p}


def set_transformer_params(
    sd: Mapping[str, np.ndarray], pointcloud_variant: bool = False
) -> Dict[str, Any]:
    """Convert the generic ``SetTransformer``
    (``set_transformer-master/models.py:30-44``) or the ModelNet40 variant
    (``set_transformer-master/main_pointcloud.py:13-37``)."""
    sd = strip_module_prefix(sd)
    p: Dict[str, Any] = {
        "enc_0": isab_params(sd, "enc.0"),
        "enc_1": isab_params(sd, "enc.1"),
    }
    if pointcloud_variant:
        p["dec_pma"] = pma_params(sd, "dec.1")
        p["dec_out"] = _dense(sd, "dec.3")
    else:
        p["dec_pma"] = pma_params(sd, "dec.0")
        p["dec_sab_0"] = sab_params(sd, "dec.1")
        p["dec_sab_1"] = sab_params(sd, "dec.2")
        p["dec_out"] = _dense(sd, "dec.3")
    return {"params": p}
