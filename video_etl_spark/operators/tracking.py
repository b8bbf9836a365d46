"""Multi-object tracking operators (SURVEY.md W2/J2/U12).

Re-expresses the reference's SORT tracker (`workloads/transMOT/sort.py`:
Kalman predict/update 94-151, IoU association 154-196, track lifecycle
210-253) as a Spark ``applyInPandas`` operator: detections are grouped by
stream key, each group is processed in frame order by a vectorized
per-partition tracker.  This is the (b) strategy from the build brief —
per-key ordered state that Spark's built-in operators can't express.

Differences from the reference, by design:
* scipy isn't shipped, so association is greedy best-IoU-first instead of
  Hungarian — the reference itself falls back to a non-optimal matcher when
  `lap` is missing (`sort.py:36-44`); greedy is deterministic and O(n²logn).
* the motion model is constant-velocity on the box center/scale — the same
  state the reference's Kalman tracks (x∈R⁷, `sort.py:101-115`) minus the
  covariance bookkeeping, which only matters with noisy real detections.

Scale posture: one shuffle on the stream key, then per-key work is linear in
frames — the same layout a 1000-executor cluster wants (each stream's frames
co-located, state never crosses executors).  The streaming twin of this
operator is `streaming.stateful.streaming_sort_tracker` — the same
`track_frames` stepping under `applyInPandasWithState`, keyed the same way,
micro-batch-split-equivalence-tested against this batch operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

TRACKS_SCHEMA = (
    "stream string, frame_no long, track_id long, x0 double, y0 double, "
    "x1 double, y1 double, age long, hits long"
)


def _iou(a: tuple, b: tuple) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    if inter <= 0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


class _Track:
    __slots__ = ("track_id", "box", "vel", "age", "hits", "misses", "kf")

    def __init__(self, track_id: int, box: tuple, motion: str) -> None:
        self.track_id = track_id
        self.box = box
        self.vel = (0.0, 0.0)
        self.age = 0
        self.hits = 1
        self.misses = 0
        if motion == "kalman":
            from video_etl_spark.operators.kalman import KalmanBoxFilter

            self.kf = KalmanBoxFilter(box)
        else:
            self.kf = None

    def predict(self) -> tuple:
        if self.kf is not None:
            return self.kf.predict()
        dx, dy = self.vel
        x0, y0, x1, y1 = self.box
        return (x0 + dx, y0 + dy, x1 + dx, y1 + dy)

    def update(self, box: tuple) -> None:
        if self.kf is not None:
            self.kf.update(box)
            self.box = self.kf.box()
        else:
            pcx = (self.box[0] + self.box[2]) / 2
            pcy = (self.box[1] + self.box[3]) / 2
            ncx = (box[0] + box[2]) / 2
            ncy = (box[1] + box[3]) / 2
            self.vel = (ncx - pcx, ncy - pcy)
            self.box = box
        self.hits += 1
        self.misses = 0


def _iou_matrix(pred_boxes: list, det_boxes: list) -> np.ndarray:
    """(T, N) IoU matrix via numpy broadcasting — the per-frame hot loop,
    so no Python-level pairwise calls."""
    P = np.asarray(pred_boxes, dtype=np.float64)
    D = np.asarray(det_boxes, dtype=np.float64)
    ix = np.maximum(
        0.0,
        np.minimum(P[:, None, 2], D[None, :, 2])
        - np.maximum(P[:, None, 0], D[None, :, 0]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(P[:, None, 3], D[None, :, 3])
        - np.maximum(P[:, None, 1], D[None, :, 1]),
    )
    inter = ix * iy
    area_p = (P[:, 2] - P[:, 0]) * (P[:, 3] - P[:, 1])
    area_d = (D[:, 2] - D[:, 0]) * (D[:, 3] - D[:, 1])
    union = area_p[:, None] + area_d[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(inter > 0, inter / union, 0.0)


def _associate(
    preds: list, dets: list, iou_threshold: float, association: str
) -> tuple[set[int], set[int], list[tuple[int, int]]]:
    """Detection↔track association (J2).  `hungarian` solves optimal
    min-cost assignment on −IoU then rejects pairs under the threshold
    (`sort.py:154-196`); `greedy` takes best-IoU-first."""
    matches: list[tuple[int, int]] = []
    if not preds or not dets:
        return set(), set(), matches
    iou = _iou_matrix([p for _, p in preds], dets)
    if association == "hungarian":
        from video_etl_spark.operators.assignment import hungarian

        for ti, di in hungarian(-iou):
            if iou[ti, di] >= iou_threshold:
                matches.append((ti, di))
    else:
        ti_idx, di_idx = np.nonzero(iou >= iou_threshold)
        order = np.lexsort((di_idx, ti_idx, -iou[ti_idx, di_idx]))
        seen_t: set[int] = set()
        seen_d: set[int] = set()
        for pos in order:
            ti, di = int(ti_idx[pos]), int(di_idx[pos])
            if ti in seen_t or di in seen_d:
                continue
            seen_t.add(ti)
            seen_d.add(di)
            matches.append((ti, di))
    used_t = {ti for ti, _ in matches}
    used_d = {di for _, di in matches}
    return used_t, used_d, matches


def track_frames(
    stream,
    pdf: pd.DataFrame,
    tracks: list[_Track],
    next_id: int,
    iou_threshold: float = 0.3,
    max_age: int = 3,
    motion: str = "kalman",
    association: str = "hungarian",
) -> tuple[list[tuple], list[_Track], int]:
    """Step the tracker over frame-ordered detections FROM existing state.

    Returns (output rows, live tracks, next_id) so callers can resume:
    ``track_group`` starts from empty state (batch), the streaming twin
    restores/persists state per micro-batch
    (streaming.stateful.streaming_sort_tracker).
    """
    out: list[tuple] = []
    for frame_no, frame in pdf.groupby("frame_no", sort=True):
        dets = [
            (r.x0, r.y0, r.x1, r.y1) for r in frame.itertuples(index=False)
        ]
        preds = [(t, t.predict()) for t in tracks]
        used_t, used_d, matches = _associate(
            preds, dets, iou_threshold, association
        )
        for ti, di in matches:
            preds[ti][0].update(dets[di])
        # Unmatched detections spawn new tracks (`sort.py:241-244`).
        for di, d in enumerate(dets):
            if di not in used_d:
                tracks.append(_Track(next_id, d, motion))
                next_id += 1
        # Age/kill unmatched tracks (`sort.py:245-253`).
        survivors: list[_Track] = []
        for ti, t in enumerate(preds):
            tr = t[0]
            if ti not in used_t:
                tr.misses += 1
                tr.box = t[1]  # coast on prediction
            tr.age += 1
            if tr.misses <= max_age:
                survivors.append(tr)
        tracks = survivors + [t for t in tracks if t.age == 0]
        for t in tracks:
            if t.age == 0 or t.misses == 0:
                out.append(
                    (
                        stream,
                        int(frame_no),
                        t.track_id,
                        t.box[0],
                        t.box[1],
                        t.box[2],
                        t.box[3],
                        t.age,
                        t.hits,
                    )
                )

    return out, tracks, next_id


TRACK_COLUMNS = [
    "stream",
    "frame_no",
    "track_id",
    "x0",
    "y0",
    "x1",
    "y1",
    "age",
    "hits",
]


def track_group(
    pdf: pd.DataFrame,
    iou_threshold: float = 0.3,
    max_age: int = 3,
    motion: str = "kalman",
    association: str = "hungarian",
) -> pd.DataFrame:
    """Run the tracker over one stream's detections (frame-ordered).

    Mirrors `sort.py:210-253`: predict all live tracks, associate by IoU
    (threshold 0.3 like `sort.py:158`), spawn tracks for unmatched
    detections, kill tracks after `max_age` misses.  `motion` picks the
    Kalman filter (D14 parity) or a plain constant-velocity model;
    `association` picks optimal Hungarian or greedy matching.
    """
    # Stable sort on the full box key: tied (frame_no, x0, y0) detections
    # must order identically here and in the streaming twin (unstable
    # quicksort over different array slices could flip tie order and
    # diverge track-id assignment).
    pdf = pdf.sort_values(
        ["frame_no", "x0", "y0", "x1", "y1"], kind="mergesort"
    )
    stream = pdf["stream"].iloc[0] if len(pdf) else None
    out, _tracks, _next_id = track_frames(
        stream, pdf, [], 0, iou_threshold, max_age, motion, association
    )
    return pd.DataFrame(out, columns=TRACK_COLUMNS)


def sort_tracker(detections: DataFrame, **kw) -> DataFrame:
    """Distribute the tracker: one shuffle on the stream key, then
    per-stream frame-ordered tracking inside ``applyInPandas``.

    Input schema: stream string, frame_no long, x0/y0/x1/y1 double (conf and
    extra columns pass through ungrouped).
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(detections.sparkSession)
    cols = ["stream", "frame_no", "x0", "y0", "x1", "y1"]
    return (
        detections.select(*cols)
        .groupBy("stream")
        .applyInPandas(lambda pdf: track_group(pdf, **kw), TRACKS_SCHEMA)
    )
