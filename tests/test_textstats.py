

def test_flesch_reading_ease_reference_values(spark):
    from trial_submission_studio_spark.operators.textstats import (
        flesch_reading_ease,
        sentence_count,
        syllable_count,
    )

    rows = [
        (1, "The cat sat on the mat."),
        (2, "The quick brown fox jumps over the lazy dog. It runs far!"),
        (3, ""),
        (4, "word"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r.i: (r.s, r.y, r.f)
        for r in df.select(
            "i",
            sentence_count("t").alias("s"),
            syllable_count("t").alias("y"),
            flesch_reading_ease("t").alias("f"),
        ).collect()
    }

    import re

    def py_flesch(t):
        words = len(t.split())
        if not words:
            return None
        sents = max(len(re.findall(r"[.!?。]+", t)), 1)
        sylls = len(re.findall(r"[aeiouy]+", t.lower()))
        return 206.835 - 1.015 * words / sents - 84.6 * sylls / words

    for i, t in rows:
        s, y, f = got[i]
        want = py_flesch(t)
        if want is None:
            assert f is None
        else:
            assert abs(f - want) < 1e-9, (i, f, want)
    assert got[1][0] == 1 and got[2][0] == 2
    # one-syllable-per-word sanity: 6 words, 6 vowel groups
    assert got[1][1] == 6
