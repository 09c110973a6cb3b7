"""Porter stemmer unit tests (full-pipeline outputs, not per-step
intermediates) + determinism/idempotence-ish properties."""

from commentsearchengine_spark.functions.stemmer import porter_stem

# full-pipeline expected outputs for words from Porter's published
# per-step examples (steps compose, e.g. differentli -> different -> differ)
CASES = {
    "caresses": "caress", "ponies": "poni", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "effective": "effect", "probate": "probat", "rate": "rate",
    "controll": "control", "roll": "roll",
}


def test_reference_vocabulary():
    got = {w: porter_stem(w) for w in CASES}
    assert got == CASES


def test_short_words_unchanged():
    for w in ("a", "is", "be", "by"):
        assert porter_stem(w) == w


def test_deterministic():
    words = ["streaming", "windows", "partitions", "batches", "joined"]
    assert [porter_stem(w) for w in words] == [porter_stem(w) for w in words]
