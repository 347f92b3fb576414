"""Plugin-registry contract: contributing an operator is one register_op
call; the driver surface (queries/oracle_sql) picks it up untouched."""

import pyarrow as pa
import pytest

from miru_ray import plugins


def test_builtin_registry_covers_driver_surface():
    import __ray_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 44
    assert set(oracles) <= set(qs)
    # the legitimately-approximate ops (LSH recall reports — defined by
    # comparison against a ground truth, not by a dataset expression) are
    # rows-only; everything else, including the deterministic-given-its-
    # hash HLL sketch, carries a SQL oracle
    assert set(qs) - set(oracles) == {
        "ann_lsh_recall", "embedding_neardup_lsh_recall"}
    ops = plugins.registered_ops()
    assert all(o.name == n for n, o in ops.items())


def test_register_new_op_via_contract():
    """A brand-new operator registered purely through the contract appears
    in the driver surface and runs."""

    def my_op(sf_dir: str) -> pa.Table:
        import pyarrow.parquet as pq
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        return pa.table({"n_docs": pa.array([n], pa.int64())})

    sql = "SELECT count(*)::BIGINT AS n_docs FROM documents"
    plugins.register_op("test_contract_op", my_op, sql, tags=("test",))
    try:
        import __ray_entry__ as E
        qs, oracles = E.queries(), E.oracle_sql()
        assert "test_contract_op" in qs and oracles["test_contract_op"] == sql
        out = qs["test_contract_op"]("/root/testdata/sf0.001")
        assert out["n_docs"][0].as_py() == 500
        # duplicate registration is an error (names are the contract)
        with pytest.raises(ValueError, match="already registered"):
            plugins.register_op("test_contract_op", my_op)
    finally:
        plugins.unregister_op("test_contract_op")
    assert "test_contract_op" not in plugins.queries()
