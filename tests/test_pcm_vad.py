"""q480: oracle parity plus a from-scratch Python VAD replay over the
same integer waveform, and fixture-discrimination checks."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    compare_query(spark, duck, "q480_pcm_silence_runs")


def _vad(samples, frame=16, amp=8000):
    frames = [samples[i : i + frame] for i in range(0, len(samples), frame)]
    flags = [
        sum(s * s for s in ch) < len(ch) * amp * amp for ch in frames
    ]
    runs = []
    cur = 0
    for f in flags:
        if f:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    return len(flags), sum(flags), len(runs), max(runs, default=0)


def test_q480_python_vad_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {
        r["media_id"]: r
        for r in all_queries()["q480_pcm_silence_runs"](spark, SF_DIR).collect()
    }
    some_silence = 0
    for mid, r in rows.items():
        samples = [
            s
            for (s,) in duck.execute(
                "SELECT (CAST(floor(value * 100 + 0.5) AS BIGINT) % 32768)"
                " - 16384 FROM events WHERE user_id = ? ORDER BY ts, event_id",
                [mid],
            ).fetchall()
        ]
        nf, ns, nr, longest = _vad(samples)
        assert (
            r["n_frames"],
            r["n_silent"],
            r["n_runs"],
            r["longest_run"],
        ) == (nf, ns, nr, longest)
        some_silence += ns
    # the fixture's uniform waveform must dip below the gate somewhere,
    # or the detector was never exercised
    assert some_silence > 0
    assert any(r["n_silent"] == 0 for r in rows.values())  # and not everywhere
