"""Trainable char-trigram language ID: train on labeled samples,
classify held-out sentences across scripts."""

from trial_submission_studio_spark.operators.langid import (
    classify_language,
    train_language_profiles,
)

TRAIN = [
    ("en", "the quick brown fox jumps over the lazy dog and runs away"),
    ("en", "this is a simple english sentence with common words in it"),
    ("en", "where there is a will there is usually a way to win"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux"),
    ("fr", "ceci est une phrase simple avec des mots courants dedans"),
    ("fr", "il y a toujours un chemin pour ceux qui veulent reussir"),
    ("de", "der schnelle braune fuchs springt über den faulen hund weg"),
    ("de", "dies ist ein einfacher deutscher satz mit häufigen wörtern"),
    ("de", "wo ein wille ist da ist auch meistens ein guter weg"),
    ("es", "el rapido zorro marron salta sobre el perro perezoso hoy"),
    ("es", "esta es una frase sencilla con palabras comunes dentro"),
    ("es", "donde hay voluntad suele haber tambien un buen camino"),
    ("zh", "敏捷的棕色狐狸跳过了那只懒惰的狗然后跑开了"),
    ("zh", "这是一个包含常用词的简单中文句子用来训练"),
    ("zh", "有志者事竟成这句话在很多地方都适用的"),
]

HELD_OUT = [
    (1, "the dog and the fox play in the garden with us", "en"),
    (2, "une phrase pour le chien et le renard dans le jardin", "fr"),
    (3, "ein satz über den hund und den fuchs im garten", "de"),
    (4, "una frase sobre el perro y el zorro en el jardin", "es"),
    (5, "狐狸和狗在花园里玩耍了很久", "zh"),
]


def test_langid_classifies_held_out_sentences(spark):
    labeled = spark.createDataFrame(TRAIN, "lang string, text string")
    profiles = train_language_profiles(labeled, "lang", "text", top_k=200)
    assert profiles.groupBy("lang").count().count() == 5

    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in classify_language(docs, profiles, "doc_id", "text").collect()
    }
    assert got == {i: lang for i, _, lang in HELD_OUT}


def test_langid_unknown_language_scores_null(spark):
    labeled = spark.createDataFrame(TRAIN, "lang string, text string")
    profiles = train_language_profiles(labeled, "lang", "text", top_k=200)
    docs = spark.createDataFrame(
        [(1, "ωραία ελληνική πρόταση χωρίς προφίλ γλώσσας εδώ")],
        "doc_id long, text string",
    )
    out = classify_language(
        docs, profiles, "doc_id", "text", min_score=0.3
    ).collect()
    assert len(out) == 1 and out[0]["lang"] is None


def test_langid_deterministic_across_partitionings(spark):
    labeled = spark.createDataFrame(TRAIN, "lang string, text string")
    profiles = train_language_profiles(labeled, "lang", "text", top_k=200)
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id long, text string"
    )
    a = sorted(
        (r["doc_id"], r["lang"])
        for r in classify_language(docs, profiles, "doc_id", "text").collect()
    )
    b = sorted(
        (r["doc_id"], r["lang"])
        for r in classify_language(
            docs.repartition(7), profiles, "doc_id", "text"
        ).collect()
    )
    assert a == b
