"""Resumable partitioned output sink: skip-finished-partitions semantics."""

import numpy as np
import pyarrow as pa


def test_write_partitioned_resume(ray_session, tmp_path):
    import ray.data as rd

    from raylink.sink import read_manifest, read_partitioned, write_partitioned

    n = 5000
    ds = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                  "val": pa.array(np.arange(n, dtype=np.float64) * 0.5)})
    )
    out = str(tmp_path / "out")
    man = write_partitioned(ds, out, key="vid", num_parts=8)
    assert sorted(man["completed"]) == list(range(8))
    back = read_partitioned(out).to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(back) == n and (back["vid"].to_numpy() == np.arange(n)).all()

    # simulate partial failure: mark partitions 0..5 done, delete 6,7 outputs
    import json, os, shutil

    man["completed"] = list(range(6))
    with open(os.path.join(out, "_manifest.json"), "w") as f:
        json.dump(man, f)
    shutil.rmtree(os.path.join(out, "part=6"))
    shutil.rmtree(os.path.join(out, "part=7"))
    man2 = write_partitioned(ds, out, key="vid", num_parts=8)
    assert sorted(man2["completed"]) == list(range(8))
    back2 = read_partitioned(out).to_pandas()
    assert len(back2) == n
    # fully-complete rerun is a no-op
    man3 = write_partitioned(ds, out, key="vid", num_parts=8)
    assert sorted(man3["completed"]) == list(range(8))
