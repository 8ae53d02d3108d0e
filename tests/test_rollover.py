"""ES _rollover (engine/rollover.py) + the forcemerge CLI handler."""

from __future__ import annotations

import json

import pytest

from engine.corpus import webpages
from engine.ingest import EARLIEST, as_partitioned_source, run_ingest_loop
from engine.rollover import _next_generation, find_alias_index, rollover
from engine.segments import IndexStore


def test_generation_naming():
    assert _next_generation("web") == "web-000001"
    assert _next_generation("web-000001") == "web-000002"
    assert _next_generation("web-000999") == "web-001000"


@pytest.fixture()
def rolled_root(spark, tmp_path):
    root = str(tmp_path)
    st = IndexStore(root, "web-000001").create()
    st.add_alias("web_write", routing=None)
    src = as_partitioned_source(webpages(spark, 80, partitions=2), 2)
    run_ingest_loop(spark, st, src, rows_per_partition=20,
                    start_option=EARLIEST)  # 2 batches -> 2 segments
    return root


def test_rollover_conditions_and_swap(spark, rolled_root):
    root = rolled_root
    # below the condition: no roll
    out = rollover(root, "web_write", max_docs=10_000)
    assert not out["rolled_over"] and out["old_index"] == "web-000001"
    assert find_alias_index(root, "web_write").name == "web-000001"
    # dry run reports but does not move
    dry = rollover(root, "web_write", max_docs=10, dry_run=True)
    assert dry["dry_run"] and not dry["rolled_over"]
    assert any(dry["conditions"].values())
    assert find_alias_index(root, "web_write").name == "web-000001"
    # met condition: alias moves to the new empty generation
    out2 = rollover(root, "web_write", max_docs=10)
    assert out2["rolled_over"] and out2["new_index"] == "web-000002"
    cur = find_alias_index(root, "web_write")
    assert cur.name == "web-000002"
    assert cur.live_segments() == []
    # old generation no longer holds the alias, but still exists
    assert "web_write" not in IndexStore(root, "web-000001")._aliases()
    # guards
    with pytest.raises(ValueError, match="condition"):
        rollover(root, "web_write")
    with pytest.raises(ValueError, match="not attached"):
        rollover(root, "nope_alias", max_docs=1)


def test_rollover_preserves_alias_spec(spark, rolled_root):
    root = rolled_root
    st = find_alias_index(root, "web_write")
    st.add_alias("en_docs", filter_col="lang", filter_val="en", routing="en")
    out = rollover(root, "en_docs", max_segments=1)
    assert out["rolled_over"]
    new = find_alias_index(root, "en_docs")
    spec = new.alias_spec("en_docs")
    assert (spec["filter_col"], spec["filter_val"], spec["routing"]) == (
        "lang", "en", "en")


def test_forcemerge_cli(spark, rolled_root, capsys):
    from jobs.index_admin import main

    rc = main(["forcemerge", "--index-root", rolled_root,
               "--index", "web-000001"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["merged"] is True and len(out["from"]) > 1
    st = IndexStore(rolled_root, "web-000001")
    assert st.live_segments() == [out["into"]]
    # idempotent second call: already one segment
    rc2 = main(["forcemerge", "--index-root", rolled_root,
                "--index", "web-000001"])
    assert rc2 == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["merged"] is False
