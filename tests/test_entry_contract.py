

def test_gate_order_prioritizes_touched_queries():
    """Round-10 driver-rotation hygiene: a verified query whose fn source
    or oracle changed since .gate_snapshot.json must sort before
    verified-untouched queries (and after never-verified ones), so the
    driver's 50-slot gate re-hashes this round's edits."""
    import __spark_entry__ as m

    precise, broad = m._touched_queries()
    order = m._gate_order(list(m.registry.QUERIES))
    verified = m._driver_verified()
    pos = {n: i for i, n in enumerate(order)}
    unverified = [n for n in order if n not in verified]
    rest = [
        n for n in order
        if n in verified and n not in precise and n not in broad
    ]
    for p in precise:
        if p in verified and rest:
            assert pos[p] < min(pos[r] for r in rest), p
        for u in unverified:
            assert pos[u] < pos[p] or p not in verified


def test_gate_snapshot_roundtrip(tmp_path):
    """gate_snapshot's hashes are deterministic and _touched_queries is
    empty against a freshly written snapshot."""
    import json
    import os
    import shutil

    import __spark_entry__ as m
    from tools.gate_snapshot import build_snapshot

    here = os.path.dirname(os.path.abspath(m.__file__))
    snap_path = os.path.join(here, ".gate_snapshot.json")
    backup = None
    if os.path.exists(snap_path):
        backup = snap_path + ".bak_test"
        shutil.copy(snap_path, backup)
    try:
        with open(snap_path, "w") as f:
            json.dump(build_snapshot(), f)
        precise, broad = m._touched_queries()
        assert precise == set()
        assert broad == set()
    finally:
        if backup:
            shutil.move(backup, snap_path)
