"""PII scrubbing goldens (functions/textstats.py pii_scrub_cols).

Pins the stage ORDER contract (an email's digits never count as a
phone; an IP's digits never count as a phone) and the Java↔RE2-safe
pattern subset via a python `re` mirror of the same three stages.
"""

import re

from pyspark.sql import functions as F

from bathyscaphe_spark.functions.textstats import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    pii_scrub_cols,
)

CASES = [
    # email swallowed before phone can see its digits
    ("write a1.b-c%d+e@mail.example.org today", "write <EMAIL> today", 1, 0, 0),
    # ip, and a version string that LOOKS like an ip (documented: matches)
    ("host 192.168.001.255 runs v1.2.3.4 now", "host <IP> runs v<IP> now", 0, 2, 0),
    # phone variants: plus, spaces, dots, hyphens
    ("call +1 555-0142-9000 or 555.014.2900 x", "call <PHONE> or <PHONE> x", 0, 0, 2),
    # ip digits must not re-count as phone (order contract)
    ("10.0.0.1", "<IP>", 0, 1, 0),
    # a long digit run is a phone even without separators
    ("ref 123456789 end", "ref <PHONE> end", 0, 0, 1),
    # 8 digits is too short for the phone shape (needs >= 9 chars)
    ("ref 12345678 end", "ref 12345678 end", 0, 0, 0),
    # all three categories in one doc
    (
        "a@b.io at 8.8.8.8 dial 555 123 4567",
        "<EMAIL> at <IP> dial <PHONE>",
        1, 1, 1,
    ),
    ("", "", 0, 0, 0),
]


def _mirror(text):
    n_e = len(re.findall(PII_EMAIL, text))
    t1 = re.sub(PII_EMAIL, "<EMAIL>", text)
    n_i = len(re.findall(PII_IPV4, t1))
    t2 = re.sub(PII_IPV4, "<IP>", t1)
    n_p = len(re.findall(PII_PHONE, t2))
    return re.sub(PII_PHONE, "<PHONE>", t2), n_e, n_i, n_p


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    c = pii_scrub_cols(F.col("text"))
    rows = (
        df.select("i", c["scrubbed"].alias("s"), c["n_emails"].alias("e"),
                  c["n_ips"].alias("ip"), c["n_phones"].alias("p"))
        .orderBy("i")
        .collect()
    )
    return [(r.s, r.e, r.ip, r.p) for r in rows]


def test_goldens(spark):
    got = _run(spark, [c[0] for c in CASES])
    for (text, want_s, we, wi, wp), (s, e, ip, p) in zip(CASES, got):
        assert (s, e, ip, p) == (want_s, we, wi, wp), text


def test_python_re_mirror_agrees(spark):
    """Java regex (Spark) and python re agree on every golden plus
    adversarial separators — the patterns stay inside the engine-
    portable subset."""
    texts = [c[0] for c in CASES] + [
        "a@b.cd e@f.gh",          # adjacent emails
        "1.2.3.4.5.6.7.8",        # run of dotted digits (two IPs)
        "+12 345 678 901 234",    # very long phone run
        "dot.end@x.yz.",          # trailing dot outside the email
        "9 . 9 . 9 . 9",          # spaced dots: phone shape, not ip
    ]
    got = _run(spark, texts)
    for t, g in zip(texts, got):
        assert g == _mirror(t), t


def test_randomized_corpus_agrees_with_re(spark):
    """200 deterministic pseudo-random ASCII strings (digit-heavy, PII
    fragments spliced in) — Spark's Java regex pipeline must agree with
    the python re mirror on every one.  One DataFrame pass, not
    per-case sessions."""
    import random

    rng = random.Random(42)
    frags = [
        "a@b.io", "10.0.0.1", "+1 555 123 4567", "1.2.3.4.5", "....",
        "a-b@c-d.org", " 99999999 ", "999999999", "@@", ".5.5.5.5",
        "x@y", "1 2 3 4 5 6 7 8 9", "-5.-5.-5.-5", "+?12",
    ]
    alphabet = "ab19 .@-+%_"
    texts = []
    for _ in range(200):
        parts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))]
        for _ in range(rng.randrange(0, 4)):
            parts.append(rng.choice(frags))
            parts.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 8))))
        texts.append("".join(parts))
    got = _run(spark, texts)
    for t, g in zip(texts, got):
        assert g == _mirror(t), repr(t)


class TestCardScrub:
    def _run(self, spark, rows):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.functions.textstats import card_scrub_cols

        df = spark.createDataFrame(rows, "id long, text string")
        c = card_scrub_cols(F.col("text"))
        out = df.select("id", c["scrubbed"].alias("s"), c["n_cards"].alias("n"))
        return {r.id: (r.n, r.s) for r in out.collect()}

    @staticmethod
    def _luhn(num):
        d = [int(x) for x in num.replace(" ", "").replace("-", "")][::-1]
        return sum(x if i % 2 == 0 else (x * 2 - 9 if x * 2 > 9 else x * 2)
                   for i, x in enumerate(d)) % 10 == 0

    def test_checksum_gates_redaction(self, spark):
        assert self._luhn("4111111111111111") and not self._luhn("4111111111111112")
        got = self._run(spark, [
            (1, "pay 4111111111111111 now"),
            (2, "or 5500 0000 0000 0004 spaced"),
            (3, "dash 4111-1111-1111-1111 mix"),
            (4, "order 4111111111111112 survives"),   # fails Luhn
            (5, "short 411111111111 stays"),           # 12 digits
            (6, "long 41111111111111111111111 stays"), # 23 digits
            (7, None),
        ])
        assert got[1] == (1, "pay <CARD> now")
        assert got[2] == (1, "or <CARD> spaced")
        assert got[3] == (1, "dash <CARD> mix")
        assert got[4] == (0, "order 4111111111111112 survives")
        assert got[5][0] == 0 and got[6][0] == 0
        assert got[7] == (None, None)

    def test_multiple_and_13_19_digit_bounds(self, spark):
        # 13-digit Visa-style test PAN and a 19-digit valid PAN
        c13 = "4222222222222"
        assert self._luhn(c13)
        base = "401288888888188"  # build a valid 19-digit by check digit
        for d in "0123456789":
            if self._luhn(base + "188" + d):
                c19 = base + "188" + d
                break
        got = self._run(spark, [(1, f"a {c13} b {c19} c")])
        assert got[1] == (2, "a <CARD> b <CARD> c")


class TestScriptMix:
    def test_intra_token_mix_flags_bilingual_clean(self, spark):
        from pyspark.sql import functions as F

        from bathyscaphe_spark.functions.textstats import script_mix_cols

        rows = [
            (1, "normal latin text only"),
            (2, "pаypal login here"),       # Cyrillic а inside token
            (3, "рус text apart"),  # separated scripts: clean
            (4, "αpple greek spoof"),        # Greek α leading token
            (5, "end-mix logиn"),            # Cyrillic и at token end
            (6, None),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        c = script_mix_cols(F.col("text"))
        got = {
            r.id: (r.mixed_tokens, r.clean)
            for r in df.select("id", *[v.alias(k) for k, v in c.items()]).collect()
        }
        assert got[1] == (0, True)
        assert got[2] == (1, False)
        assert got[3] == (0, True)
        assert got[4] == (1, False)
        assert got[5] == (1, False)
        assert got[6] == (None, None)
