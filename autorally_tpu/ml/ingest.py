"""Multi-topic log ingestion: drive logs -> merged training table.

The reference front end is rosbag-based: ``process_bag.py`` reorders a
bag by header timestamps and extracts per-topic CSVs
(``process_bag.py:43-160``), then ``preprocess.py``'s ``DataClass`` runs
a per-topic pipeline — load/rename, quaternion→euler, spline
derivatives, polyphase resampling to a common rate, truncation — and the
trainer clips topics to a common window, concatenates them column-wise
and optionally standardizes (``trainer.py:19-160``).

This framework's "bag" is the JSONL multi-topic log written by the sim
node (``tools/sim_node.py --log``) or any process emitting
``{"topic": ..., "secs": ..., "nsecs": ..., <fields>}`` rows — same
information, no ROS dependency.  The per-topic pipeline below mirrors
``DataClass`` operation-for-operation (including the ``secs + nsecs/1e9``
time combine, spline ``s=0`` derivatives, and ``resample_poly``), driven
by the same spec shape as the reference's ``config.yml`` ``topics:``
list, so a reference user's topic config ports directly.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np


def read_jsonl_topics(path: str) -> Dict[str, "pd.DataFrame"]:
    """Split a JSONL log into per-topic DataFrames, rows ordered by
    timestamp (the reorder_bag + extract_bag_to_csv roles,
    ``process_bag.py:43-160``)."""
    import pandas as pd

    rows: Dict[str, list] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            topic = rec.pop("topic", None)
            if topic is None:
                continue
            rows.setdefault(topic, []).append(rec)
    out = {}
    for topic, rs in rows.items():
        df = pd.DataFrame(rs)
        if "secs" in df.columns:         # reorder by header timestamps
            key = df["secs"] + df.get("nsecs", 0) / 1e9
            df = df.iloc[np.argsort(key.to_numpy(), kind="stable")]
            df = df.reset_index(drop=True)
        out[topic] = df
    return out


class TopicData:
    """Per-topic preprocessing pipeline (``preprocess.py`` DataClass)."""

    def __init__(self, df, column_mapper: Optional[dict] = None):
        self.df = df.copy()
        self.column_mapper = column_mapper

    # -- load/format steps (DataClass.prep_data, preprocess.py:28-72) -------

    def format_time_col(self) -> "TopicData":
        """secs + nsecs/1e9 combined IN PLACE into ``secs``
        (preprocess.py:54-59) — the reference's col_mapper then renames
        ``secs`` to ``time``.  For specs whose mapper doesn't, ``time``
        is also set directly (the JSONL sim-node topics)."""
        if "secs" in self.df.columns:
            self.df["secs"] = (self.df["secs"]
                               + self.df.get("nsecs", 0) / 1e9)
            mapped = (self.column_mapper or {}).get("secs")
            if mapped != "time":
                self.df["time"] = self.df["secs"]
        return self

    def rename_cols(self) -> "TopicData":
        if self.column_mapper:
            self.df = self.df.rename(columns=self.column_mapper)
        return self

    def extract_cols(self, cols: List[str]) -> "TopicData":
        self.df = self.df[list(cols)]
        return self

    def trim_sequence(self, end_point: float) -> "TopicData":
        """Keep rows with time <= end_point (preprocess.py:74-79)."""
        self.df = self.df[self.df["time"] <= end_point]
        return self

    # -- math steps ----------------------------------------------------------

    def quaternion_to_euler(self, x_col: str, y_col: str, z_col: str,
                            w_col: str) -> "TopicData":
        """Quaternion -> roll/pitch/yaw columns, scipy 'xyz' convention
        exactly like the reference (preprocess.py:175-205)."""
        from scipy.spatial.transform import Rotation

        # copy: pandas may hand back a read-only view, and scipy's
        # Cython quaternion path requires a writable buffer
        quats = np.array(self.df[[x_col, y_col, z_col, w_col]], dtype=float)
        eul = Rotation.from_quat(quats).as_euler("xyz", degrees=False)
        self.df["roll"] = eul[:, 0]
        self.df["pitch"] = eul[:, 1]
        self.df["yaw"] = eul[:, 2]
        return self

    def get_data_derivative(self, cols: List[str], degree: int = 3
                            ) -> "TopicData":
        """Interpolating-spline derivatives, ``<col>_der``
        (preprocess.py:105-131)."""
        from autorally_tpu.ml.dataset import spline_derivative

        t = self.df["time"].to_numpy(float)
        for c in cols:
            self.df[c + "_der"] = spline_derivative(
                t, self.df[c].to_numpy(float), degree)
        return self

    def resample_data(self, end_point: float, up: int, down: int,
                      cols: List[str]) -> "TopicData":
        """Polyphase resample selected columns and rebuild the time axis
        on [0, end_point] (preprocess.py:133-172; note the reference's
        time-starts-at-zero assumption is preserved by shifting)."""
        import pandas as pd
        from scipy import signal

        new = {}
        t_new = None
        for c in cols:
            if c not in self.df.columns:
                continue
            y = signal.resample_poly(self.df[c].to_numpy(float), up, down)
            new[c] = y
            if t_new is None:
                t_new = np.linspace(0, end_point, len(y))
                new["time"] = t_new
        self.df = pd.DataFrame(new)
        return self

    def trunc(self, cols: List[str], maximum: float = 1.0,
              minimum: float = -1.0) -> "TopicData":
        """Clip columns into [minimum, maximum] (preprocess.py:81-103)."""
        for c in cols:
            self.df[c] = self.df[c].clip(minimum, maximum)
        return self


def clip_start_end_times(col: str, *dfs):
    """Clip all frames to [ceil(max start), floor(min end)] on ``col``
    (preprocess.py:207-233)."""
    start = max(df.head(1)[col].values[0] for df in dfs)
    end = min(df.tail(1)[col].values[0] for df in dfs)
    lo, hi = np.ceil(start), np.floor(end)
    return [df[(df[col] >= lo) & (df[col] <= hi)] for df in dfs]


# Topic spec for sim-node logs, same shape as the reference config.yml
# ``topics:`` list (col_mapper / quaternion_to_euler / compute_derivatives
# / resample / trunc) so a reference user's config ports directly.
SIM_NODE_TOPICS = [
    {
        "name": "ground_truth/state",
        "col_mapper": {"x": "x_pos", "y": "y_pos"},
        "quaternion_to_euler": {"x": "qx", "y": "qy", "z": "qz", "w": "qw"},
        "compute_derivatives": {"cols": ["roll", "u_x", "u_y", "yaw_mder"],
                                "degree": 3},
        "resample": {"upsampling_factor": 1, "downsampling_factor": 1,
                     "cols": ["x_pos", "y_pos", "yaw", "roll", "roll_der",
                              "u_x", "u_x_der", "u_y", "u_y_der",
                              "yaw_mder", "yaw_mder_der"]},
        "trunc": {"cols": ["roll", "yaw"],
                  "max": np.pi, "min": -np.pi},
    },
    {
        "name": "chassisState",
        "col_mapper": {},
        "resample": {"upsampling_factor": None, "downsampling_factor": None,
                     "cols": ["steering", "throttle"]},
        "trunc": {"cols": ["steering", "throttle"], "max": 1.0, "min": -1.0},
    },
]


def ingest_log(path: str, topics: Optional[List[dict]] = None,
               total_data: Optional[float] = None) -> "pd.DataFrame":
    """Run the full multi-topic pipeline on a JSONL log and return the
    merged training table (the trainer.py ``preprocess_data`` phase,
    trainer.py:19-117: per-topic DataClass steps, resample to the first
    topic's rate, column-wise concat)."""
    topics = SIM_NODE_TOPICS if topics is None else topics
    return run_topic_pipeline(read_jsonl_topics(path), topics, total_data)


def run_topic_pipeline(frames: Dict[str, "pd.DataFrame"],
                       topics: List[dict],
                       total_data: Optional[float] = None
                       ) -> "pd.DataFrame":
    """Per-topic DataFrames -> merged training table (shared by the
    JSONL path above and the reference-CSV migration path,
    ``ml/reference_config.py``)."""
    import pandas as pd

    dfs = []
    end_point = None
    sample_rate = None
    for spec in topics:
        name = spec["name"]
        if name not in frames:
            raise ValueError(f"topic '{name}' not present; "
                             f"found {sorted(frames)}")
        td = TopicData(frames[name], spec.get("col_mapper"))
        td.format_time_col().rename_cols()
        if total_data:
            td.trim_sequence(total_data
                             + round(td.df.head(1)["time"].values[0]))
        if "quaternion_to_euler" in spec:
            q = spec["quaternion_to_euler"]
            td.quaternion_to_euler(q["x"], q["y"], q["z"], q["w"])
        if "compute_derivatives" in spec:
            der = spec["compute_derivatives"]
            td.get_data_derivative(der["cols"], der["degree"])
        if end_point is None:
            end_point = int(round(td.df.tail(1)["time"].values[0])
                            - round(td.df.head(1)["time"].values[0]))
        rs = spec.get("resample", {})
        if rs.get("cols"):
            if not rs.get("upsampling_factor"):
                # match-the-first-topic convention: resample this topic to
                # the row count an earlier topic established
                if sample_rate is None:
                    raise ValueError(
                        f"topic '{name}': the first resampled topic must "
                        "set explicit upsampling_factor/downsampling_factor"
                        " — there is no earlier topic to match")
                up, down = sample_rate, len(td.df)
            else:
                up, down = rs["upsampling_factor"], rs["downsampling_factor"]
            td.resample_data(end_point, up, down, rs["cols"])
            sample_rate = len(td.df)
        if "trunc" in spec:
            tr = spec["trunc"]
            td.trunc(tr["cols"], maximum=tr["max"], minimum=tr["min"])
        dfs.append(td.df)

    # merge columns; keep one time axis (trainer.py:108-110 concat)
    final = pd.concat(
        [dfs[0]] + [d.drop(columns=["time"], errors="ignore")
                    for d in dfs[1:]], axis=1)
    return final.dropna().reset_index(drop=True)
