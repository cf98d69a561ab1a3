"""Host-side tracking accept/lost gates (slam/system.py track_lost).

The reference decides LOST from BOTH feature families
(TrackLocalMapBoth accept cascade, src/Tracking.cc:2097-2108): a frame
rich in line inliers survives a point drought. The rebuild's batch and
sequential consumers share one gate function; these tests pin its
truth table so a points-only simplification can't silently regress the
point+line path again (it did: the mono+line bench scene decayed to
<10 point inliers near its oscillation extremes and was declared LOST
with healthy line tracking available)."""

from splslam_tpu.slam.system import track_lost


def test_point_only_floor_unchanged():
    assert track_lost(9, 0, using_line=False)
    assert not track_lost(10, 0, using_line=False)
    # lines never rescue a point-only run (there are none by definition;
    # a stale stats slot must not leak in)
    assert track_lost(9, 99, using_line=False)


def test_dual_gate_sum_cascade():
    # reference cascade reduces to pts+lines >= 12
    assert not track_lost(12, 0, using_line=True)
    assert not track_lost(0, 12, using_line=True)
    assert not track_lost(5, 7, using_line=True)
    assert track_lost(5, 6, using_line=True)
    assert track_lost(11, 0, using_line=True)
    # the redundant explicit clauses of the reference cascade hold
    assert not track_lost(28, 0, using_line=True)   # pts>=28
    assert not track_lost(21, 12, using_line=True)  # pts>=21 & lines>=12


def test_recent_reloc_is_stricter():
    # within mMaxFrames of a relocalization: >=30 points or >=15 lines
    # (reference Tracking.cc:2097-2098)
    assert track_lost(29, 14, using_line=True, recent_reloc=True)
    assert not track_lost(30, 0, using_line=True, recent_reloc=True)
    assert not track_lost(0, 15, using_line=True, recent_reloc=True)
    # the same counts pass once the window expires
    assert not track_lost(29, 14, using_line=True, recent_reloc=False)
