"""Lifecycle semantics of the tracked-persist registry
(tpg_weather_etl_spark/caching.py) — the primitive bench.py's
repeat-median isolation is built on."""

from __future__ import annotations

from tpg_weather_etl_spark import caching
from tpg_weather_etl_spark.caching import (
    mark,
    release_all,
    release_since,
    track,
)


def _fresh():
    release_all()
    assert caching._TRACKED == []


def test_track_is_idempotent_per_plan(spark):
    """Re-tracking the same logical plan must not add a second
    registry entry: the CacheManager holds ONE cache per plan, so a
    second entry would let release_since unpersist a shared cache a
    later query merely reused (the r13 bench-repeat defect)."""
    _fresh()
    a1 = track(spark.range(100).selectExpr("id", "id * 2 AS v")
               .persist())
    a2 = track(spark.range(100).selectExpr("id", "id * 2 AS v")
               .persist())
    other = track(spark.range(50).persist())
    assert len(caching._TRACKED) == 2  # a-plan once + other
    assert a1.count() == a2.count() == 100
    assert other.count() == 50
    release_all()


def test_release_since_scopes_to_creation(spark):
    """A consumer that re-tracks an earlier query's shared cache must
    NOT have that cache released by its own release_since window."""
    _fresh()
    shared = track(spark.range(1000).selectExpr(
        "id", "id % 7 AS k").persist())
    shared.count()  # materialize

    m = mark()
    own = track(spark.range(10).persist())
    track(spark.range(1000).selectExpr("id", "id % 7 AS k")
          .persist())  # the consumer re-tracks the shared plan
    own.count()
    freed = release_since(m)
    assert freed == 1  # only `own`; the shared cache survives
    assert shared.storageLevel.useMemory  # still persisted
    assert len(caching._TRACKED) == 1
    release_all()
    assert not shared.storageLevel.useMemory


def test_parallel_index_lists_stay_aligned_without_jvm():
    """The r14 semanticHash index keeps three parallel lists; a
    registration whose plan access fails (stopping session — modeled
    here by objects with no _jdf at all) must still append aligned
    placeholder slots, and release must pop all three in lockstep."""
    _fresh()

    class _NoJvm:
        def unpersist(self, blocking=False):
            return self

    a, b = _NoJvm(), _NoJvm()
    track(a)
    track(b)  # no dedup possible without a plan: both register
    assert len(caching._TRACKED) == 2
    assert len(caching._PLANS) == 2 == len(caching._HASHES)
    assert caching._PLANS == [None, None]

    m = mark()
    track(_NoJvm())
    assert release_since(m) == 1
    assert (len(caching._TRACKED) == len(caching._PLANS)
            == len(caching._HASHES) == 2)
    assert release_all() == 2
    assert (caching._TRACKED == [] and caching._PLANS == []
            and caching._HASHES == [])


def test_stale_plan_handle_does_not_break_registration():
    """A handle whose JVM side died (stopped session) must be treated
    as a non-match in the collision check, not propagate from
    track()."""
    _fresh()

    class _Plan:
        def __init__(self, boom=False):
            self.boom = boom

        def semanticHash(self):
            return 7  # force every entry into one collision bucket

        def sameResult(self, other):
            if self.boom:
                raise RuntimeError("py4j: target gone")
            return False

    class _Df:
        def __init__(self, boom=False):
            self._plan = _Plan(boom)
            self._jdf = self

        def queryExecution(self):
            return self

        def analyzed(self):
            return self._plan

        def unpersist(self, blocking=False):
            return self

    track(_Df(boom=True))      # entry whose handle will "die"
    track(_Df())               # collision-bucket probe hits the stale
    assert len(caching._TRACKED) == 2   # registered despite the raise
    release_all()
