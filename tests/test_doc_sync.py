"""Doc-drift guard (VERDICT r4 #5: README/BASELINE quoted hand-run
numbers where the driver capture said otherwise, two rounds running).

README.md and BASELINE.md carry a machine-readable marker line

    <!-- BENCH_HEADLINE: ms_per_step=<X> source=BENCH_r<NN> -->

This test asserts (a) the marker's source is the NEWEST parsed
BENCH_r*.json in the repo root, and (b) the quoted ms/step matches
that record's driver-captured value within tunnel variance (+-20%).
When a new driver capture lands, the docs must be re-synced or this
fails."""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_bench():
    recs = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if rec.get("parsed"):
            recs.append((os.path.basename(p).split(".")[0], rec))
    if not recs:
        pytest.skip("no parsed BENCH_r*.json present")
    return recs[-1]


MARKER = re.compile(
    r"<!--\s*BENCH_HEADLINE:\s*ms_per_step=([0-9.]+)\s+"
    r"source=(BENCH_r\d+)\s*-->")


@pytest.mark.parametrize("doc", ["README.md", "BASELINE.md"])
def test_doc_headline_matches_latest_driver_capture(doc):
    name, rec = _latest_bench()
    driver_ms = rec["parsed"]["extra"]["ms_per_step"]
    with open(os.path.join(REPO, doc)) as f:
        text = f.read()
    m = MARKER.search(text)
    assert m, (f"{doc} is missing the BENCH_HEADLINE marker "
               f"(expected for {name}: ms_per_step~{driver_ms:.1f})")
    quoted, source = float(m.group(1)), m.group(2)
    assert source == name, (
        f"{doc} quotes {source} but the newest parsed driver capture "
        f"is {name} ({driver_ms:.1f} ms/step) — re-sync the docs")
    assert abs(quoted - driver_ms) / driver_ms < 0.20, (
        f"{doc} marker says {quoted} ms/step; {name} driver capture "
        f"says {driver_ms:.1f}")
