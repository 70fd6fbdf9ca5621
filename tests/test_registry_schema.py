"""Registry output-schema lint: no registered query may emit an
array or map column.

The driver's correctness gate canonicalizes each result with a pandas
lexsort over ALL columns; array/map cells arrive as Python lists/dicts,
which are unhashable, so the sort raises ``TypeError: unhashable type``
and the row goes red REGARDLESS of the values being correct.  This
exact class fired twice — ``collect_linenumbers`` (r1, fixed r2 by
emitting ``array_join(...)`` strings) and then ``inverted_index_docs``
(r6, a new query that didn't follow the house rule) — so it is now a
lint: stringify collections (``array_join``/``to_json``) at the
registry boundary; the library functions may still return real arrays.

Only the ANALYZED schema is needed (no execution), so this covers the
whole registry in one pass at sf0.001.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_no_registered_query_emits_array_or_map_columns(spark):
    import __spark_entry__ as entry

    bad: list[str] = []
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)
        offenders = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if offenders:
            bad.append(f"{name}: {offenders}")
    assert not bad, (
        "registered queries emit array/map columns the driver's pandas "
        "canonicalizer cannot lexsort (stringify with array_join/to_json "
        f"at the registry boundary): {bad}"
    )
