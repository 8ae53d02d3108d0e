"""Data-dependent partition sizing (engine.config.plan_fanout).

The fan-out formula drives the ingest doc-id/block-build partitioning and
the merge re-encode partitioning: tiny inputs must collapse to a few tasks
(per-batch fixed cost), medium inputs must use every core, bulk inputs must
grow past the core count so no partition exceeds the per-task cap.
"""

from engine.config import plan_fanout


def test_tiny_input_collapses():
    # 1,668-doc micro-batch, floor 1,000: two tasks, not 32
    assert plan_fanout(1_668, 1_000, 25_000, 32) == 2
    assert plan_fanout(100, 1_000, 25_000, 32) == 1
    assert plan_fanout(0, 1_000, 25_000, 32) == 1  # degenerate: never 0


def test_medium_input_uses_every_core():
    # 50k docs on 32 cores: all cores busy (not 2 giant partitions)
    assert plan_fanout(50_000, 1_000, 25_000, 32) == 32
    assert plan_fanout(400_000, 1_000, 25_000, 32) == 32


def test_bulk_grows_past_core_count():
    # 5M docs, 25k cap: 200 partitions — no partition exceeds the cap
    assert plan_fanout(5_000_000, 1_000, 25_000, 32) == 200


def test_floor_boundary_exact():
    assert plan_fanout(1_000, 1_000, 25_000, 32) == 1
    assert plan_fanout(1_001, 1_000, 25_000, 32) == 2


def test_merge_shape():
    # sf0.1-scale merge (~500k tokens): a handful of tasks, not 32
    assert plan_fanout(500_000, 100_000, 2_000_000, 32) == 5
    # big merge: 10^9 tokens -> 500 partitions of <= 2M postings
    assert plan_fanout(10**9, 100_000, 2_000_000, 32) == 500
