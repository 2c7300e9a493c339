"""S3 conditional-put claim backend
(operators/txlog.py::S3ConditionalPutClaim) against moto's S3: the
``If-None-Match: *`` CAS must admit exactly one writer per name,
never clobber the winner's payload, and surface environment failures
instead of reporting them as lost races."""

import threading

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from moto import mock_aws  # noqa: E402

from crypto_etl_airflow_spark.operators.txlog import (  # noqa: E402
    S3ConditionalPutClaim,
)

BUCKET = "txlog-test"


@pytest.fixture()
def s3():
    with mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        yield client


def test_single_claim_roundtrip(s3):
    backend = S3ConditionalPutClaim(BUCKET, prefix="tables/t1", client=s3)
    assert backend.claim("_txlog", "000001.json", '{"v": 1}') is True
    body = s3.get_object(
        Bucket=BUCKET, Key="tables/t1/_txlog/000001.json"
    )["Body"].read()
    assert body == b'{"v": 1}'


def test_loser_reports_false_and_never_clobbers(s3):
    backend = S3ConditionalPutClaim(BUCKET, client=s3)
    assert backend.claim("_txlog", "000002.json", "winner") is True
    assert backend.claim("_txlog", "000002.json", "loser") is False
    body = s3.get_object(Bucket=BUCKET, Key="_txlog/000002.json")[
        "Body"
    ].read()
    assert body == b"winner"


def test_distinct_names_all_win(s3):
    backend = S3ConditionalPutClaim(BUCKET, client=s3)
    assert backend.claim("_txlog", "000003.json", "a") is True
    assert backend.claim("_txlog", "000004.json", "b") is True


def test_racing_writers_exactly_one_winner(s3):
    backend = S3ConditionalPutClaim(BUCKET, client=s3)
    results: dict[int, bool] = {}
    barrier = threading.Barrier(4)

    def writer(i: int) -> None:
        barrier.wait()
        results[i] = backend.claim("_txlog", "000005.json", f"writer-{i}")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results.values()) == 1
    winner = next(i for i, won in results.items() if won)
    body = s3.get_object(Bucket=BUCKET, Key="_txlog/000005.json")[
        "Body"
    ].read()
    assert body == f"writer-{winner}".encode()


def test_environment_failure_surfaces_not_false(s3):
    from botocore.exceptions import ClientError

    backend = S3ConditionalPutClaim("no-such-bucket", client=s3)
    with pytest.raises(ClientError):
        backend.claim("_txlog", "000001.json", "x")
