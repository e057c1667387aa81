"""vocab_growth / stay_od_flows unit coverage."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.ops.staypoints import stay_od_flows
from geoflow.text.vocab import vocab_growth


def test_vocab_growth_known(ray_session):
    texts = {0: "a b a", 1: "b c", 2: "d d d", 3: "a e"}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string())}))
    out = vocab_growth(ds, thresholds=(1, 2, 4)).to_pandas() \
        .set_index("k")
    assert out.loc[1].tolist() == [2, 3]        # {a,b}, 3 tokens
    assert out.loc[2].tolist() == [3, 5]        # +{c}
    assert out.loc[4].tolist() == [5, 10]       # +{d,e}


def test_od_flows_path(ray_session):
    # user 1: two stays (cluster at ~(0,0) then ~(90,90)), each a
    # 2-point run 2h apart, clusters far apart -> one trip (0,0)->(4,4)
    us = 3_600_000_000
    rows = [(1, 1, 0 * us, 0, 0), (1, 2, 2 * us, 1, 1),
            (1, 3, 10 * us, 90, 90), (1, 4, 12 * us, 91, 91)]
    uid, eid, t, x, y = zip(*rows)
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(np.array(t, np.int64).astype("datetime64[us]"),
                       pa.timestamp("us")),
        "px": pa.array(x, pa.int64()), "py": pa.array(y, pa.int64())}))
    out = stay_od_flows(ds).to_pandas()
    # anchor 1 covers points 1-2 (2h dwell -> stay, cell (0,0));
    # anchor 2's run is just itself (0 dwell -> not a stay); same
    # shape in cluster B -> stays are anchors 1 and 3: ONE trip
    got = {(r.from_cx, r.from_cy, r.to_cx, r.to_cy): r.n_trips
           for r in out.itertuples()}
    assert got == {(0, 0, 4, 4): 1}
