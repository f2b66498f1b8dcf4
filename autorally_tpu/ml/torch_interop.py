"""PyTorch interchange for dynamics models.

The reference trains in PyTorch and ships ``.npz`` to the controller
(``ml_pipeline/utils.py:49-90``: ``npz_to_torch_model`` /
``torch_model_to_npz``, float64 npz as the canonical format, plus
``setup_model:16-46`` building the tanh MLP).  This framework trains in
JAX, but teams with existing torch models/checkpoints (e.g.
``torch_model_autorally_nnet.pt``) need the bridge in both directions:

- torch ``state_dict``/module -> the :class:`NeuralNetDynamics` params
  pytree (drop a torch-trained model straight into the TPU solver)
- params pytree -> torch module (debug/compare in the torch ecosystem)
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from autorally_tpu.models.neural_net import NeuralNetDynamics


def setup_torch_model(layers: Sequence[int] = (6, 32, 32, 4)):
    """The reference's MLP builder (``utils.py:16-46``): Linear+Tanh pairs
    with a linear output layer, float64 like the reference pipeline."""
    import torch

    mods = []
    for i in range(len(layers) - 2):
        mods.append(torch.nn.Linear(layers[i], layers[i + 1]))
        mods.append(torch.nn.Tanh())
    mods.append(torch.nn.Linear(layers[-2], layers[-1]))
    return torch.nn.Sequential(*mods).double()


def torch_to_params(module, model: NeuralNetDynamics) -> dict:
    """torch module -> NeuralNetDynamics params pytree (weights stored
    (in, out) for the batched forward)."""
    linears = [m for m in module if type(m).__name__ == "Linear"]
    if len(linears) != len(model.layers) - 1:
        raise ValueError(
            f"module has {len(linears)} Linear layers; model expects "
            f"{len(model.layers) - 1}")
    weights, biases = [], []
    for lin, (fi, fo) in zip(linears, zip(model.layers, model.layers[1:])):
        W = lin.weight.detach().cpu().numpy().astype(np.float32)  # (out, in)
        b = lin.bias.detach().cpu().numpy().astype(np.float32)
        if W.shape != (fo, fi):
            raise ValueError(f"layer shape {W.shape} != ({fo}, {fi})")
        weights.append(jnp.asarray(W.T))
        biases.append(jnp.asarray(b))
    base = model.init_params(__import__("jax").random.PRNGKey(0))
    return {**base, "weights": weights, "biases": biases}


def params_to_torch(params: dict, model: NeuralNetDynamics):
    """params pytree -> torch module (float64, reference convention)."""
    import torch

    module = setup_torch_model(model.layers)
    linears = [m for m in module if isinstance(m, torch.nn.Linear)]
    with torch.no_grad():
        for lin, W, b in zip(linears, params["weights"], params["biases"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(W, dtype=np.float64).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(b, dtype=np.float64)))
    return module


def load_torch_checkpoint(path: str, model: NeuralNetDynamics) -> dict:
    """Load a reference ``.pt`` checkpoint (either a bare module or the
    trainer's ``{'model_state_dict': ...}`` dict,
    train_dynamics_model.py:115-120) into a params pytree."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict):
        # accept any naming scheme (the reference .pt uses nn0/nn1/nn2):
        # pair up *.weight / *.bias in key order
        wkeys = [k for k in obj if k.endswith(".weight")]
        weights, biases = [], []
        base = model.init_params(__import__("jax").random.PRNGKey(0))
        for k, (fi, fo) in zip(wkeys, zip(model.layers, model.layers[1:])):
            W = obj[k].detach().cpu().numpy().astype(np.float32)
            b = obj[k[:-len(".weight")] + ".bias"].detach().cpu().numpy()
            if W.shape != (fo, fi):
                raise ValueError(f"{k}: shape {W.shape} != ({fo}, {fi})")
            weights.append(jnp.asarray(W.T))
            biases.append(jnp.asarray(b.astype(np.float32)))
        return {**base, "weights": weights, "biases": biases}
    return torch_to_params(obj, model)
