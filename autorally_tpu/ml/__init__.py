"""Offline ML pipeline: dynamics-model training in JAX/optax.

Re-design of the reference's PyTorch pipeline
(``scripts/ml_pipeline/``) with the critical TPU-native property: the
trained parameter pytree drops *directly* into the MPPI rollout solver —
no ``.npz`` detour (the interchange format is still supported for
reference parity, ``utils.py:49-90``).
"""

from autorally_tpu.ml.dataset import (DynamicsDataset, preprocess_trajectory,
                                      standardize, train_val_split)
from autorally_tpu.ml.train import (TrainConfig, fold_standardization,
                                    train_dynamics)
from autorally_tpu.ml.evaluate import (instantaneous_errors,
                                       multistep_errors)
from autorally_tpu.ml.ingest import (SIM_NODE_TOPICS, TopicData, ingest_log,
                                     read_jsonl_topics)

__all__ = [
    "DynamicsDataset", "preprocess_trajectory", "standardize",
    "train_val_split", "TrainConfig", "train_dynamics",
    "fold_standardization", "instantaneous_errors", "multistep_errors",
    "SIM_NODE_TOPICS", "TopicData", "ingest_log", "read_jsonl_topics",
]
