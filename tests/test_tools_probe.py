"""tools/scale_probe.py synth-cache sweep: the '<sf>-<mtime>-<size>
[-xN[-fam]]' sibling sweeper must group strictly by the anchored tag
shape — a greedy sf group could backtrack a '-<digits>'-ending sf tag
into absorbing the mtime segment and sweep an unrelated family's
multi-GB synth (r15 ADVICE) — and must LOG rather than silently skip
siblings that match no known shape."""

from __future__ import annotations

import os

import tools.scale_probe as sp


def _mk(parent, name, stamp=True):
    d = os.path.join(parent, name)
    os.makedirs(d, exist_ok=True)
    if stamp:
        open(os.path.join(d, "payload"), "w").close()
    return d


def test_fresh_dir_sweeps_same_family_siblings_only(tmp_path, capsys):
    parent = str(tmp_path / "synth")
    out = _mk(parent, "sf0.1-2000-9000-x10", stamp=False)
    same_fam_old = _mk(parent, "sf0.1-1000-8000-x10")
    legacy = _mk(parent, "sf0.1-1000-8000")  # pre-r14: no xN segment
    other_fam = _mk(parent, "sf0.1-1000-8000-x10-tpch")
    other_sf = _mk(parent, "sf0.01-1000-8000-x10")
    unknown = _mk(parent, "scratch-notes")
    recipe = {"k": 1}
    assert sp._fresh_dir(out, recipe) is True  # no _BUILT stamp yet
    assert not os.path.isdir(same_fam_old), "superseded same-family tag"
    assert not os.path.isdir(legacy), "legacy no-xN tag is same-family"
    assert os.path.isdir(other_fam), "different family suffix is live"
    assert os.path.isdir(other_sf), "different sf is live"
    assert os.path.isdir(unknown), "unknown shape must not be deleted"
    err = capsys.readouterr().err
    assert "scratch-notes" in err, "skipped sibling must be logged"


def test_fresh_dir_tag_regex_never_absorbs_the_mtime_segment():
    """The anchored sf group only takes LETTER-LED dash segments, so a
    name like 'sf0.1-7-999-888-x10' (sf tag ending in '-<digits>') can
    never be parsed with the mtime folded into the sf — it simply does
    not match, and is skipped-with-a-log instead of mis-grouped. A
    letter-led alphanumeric segment ('sf0.1-v2-...') IS recognized, so
    versioned family tags group and retire instead of leaking their
    multi-GB synth forever (r16 ADVICE)."""
    tail_re_src = open(sp.__file__).read()
    assert "(?P<sf>sf[\\d.]+(?:-[a-z][a-z0-9]*)*)" in tail_re_src
    import re

    tail_re = re.compile(
        r"^(?P<sf>sf[\d.]+(?:-[a-z][a-z0-9]*)*)-\d+-\d+(?:-x\d+(?P<fam>(?:-\w+)?))?$"
    )
    m = tail_re.match("sf0.1-1000-8000-x10")
    assert m and m.group("sf") == "sf0.1" and m.group("fam") == ""
    m = tail_re.match("sf0.1-events-1000-8000-x100-tpch")
    assert m and m.group("sf") == "sf0.1-events" and m.group("fam") == "-tpch"
    m = tail_re.match("sf0.1-1000-8000")
    assert m and m.group("fam") is None  # legacy shape still recognized
    assert tail_re.match("sf0.1-7-999-888-x10") is None
    # digit-BEARING but letter-led segments now group (r16 ADVICE):
    m = tail_re.match("sf0.1-v2-1000-8000-x10")
    assert m and m.group("sf") == "sf0.1-v2" and m.group("fam") == ""
    # ...while the mtime segment itself (digit-led) still cannot be
    # absorbed: 'sf0.1-v2-999-888' parses sf as 'sf0.1-v2', never
    # 'sf0.1-v2-999'
    m = tail_re.match("sf0.1-v2-999-888")
    assert m and m.group("sf") == "sf0.1-v2"

def test_bench_cpu_ticks_excludes_guest_from_the_denominator():
    """r16 ADVICE: /proc/stat's guest and guest_nice are already folded
    into user/nice, so summing all ten fields double-counts guest time
    and under-reports the steal share — a run hovering just under the
    1% warning threshold could escape the contention flag. The
    denominator must be the first 8 fields (user..steal) only; both
    directions pinned on synthetic stat lines."""
    import bench

    # 8 real fields = 100 ticks total, 2 of them steal -> exactly 2%
    base = "cpu  40 10 20 20 5 2 1 2"
    steal, total = bench._cpu_ticks(base)
    assert (steal, total) == (2, 100)
    # adding guest/guest_nice (already inside user/nice) must NOT
    # dilute the share: same (2, 100), not (2, 130)
    steal, total = bench._cpu_ticks(base + " 25 5")
    assert (steal, total) == (2, 100)
    # short lines (no steal field) stay None; garbage stays None
    assert bench._cpu_ticks("cpu  1 2 3") is None
    assert bench._cpu_ticks("cpu  a b c d e f g h") is None
