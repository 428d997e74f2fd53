"""Python UDTFs (Spark 4 ``pyspark.sql.functions.udtf``).

The one-row-to-many-rows extension point with a TABLE-function calling
convention — ``SELECT ... FROM my_udtf(TABLE(...))`` / ``LATERAL`` —
complementing mapInPandas (whole-partition) and explode (array-typed).
Used where the expansion needs per-row Python state machines that
built-ins can't express; here: character-offset token spans, the
substrate for span-level redaction/highlighting (q76's PII redaction
rewrites text wholesale; spans let a caller patch bytes surgically).

Analysis-time schema, deterministic output. Python-rate cost applies —
the relational paths stay UDTF-free (test-enforced like the UDF policy);
this surface is for the declared-Python edges only.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, start int, end int")
class TokenSpans:
    """Yield (token, start_char, end_char_exclusive) for each
    whitespace-delimited token of ``text`` — a linear scan that keeps
    exact offsets (split() discards them)."""

    def eval(self, text: str):
        if text is None:
            return
        i, n = 0, len(text)
        while i < n:
            while i < n and text[i] == " ":
                i += 1
            j = i
            while j < n and text[j] != " ":
                j += 1
            if j > i:
                yield (text[i:j], i, j)
            i = j
