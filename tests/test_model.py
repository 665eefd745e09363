"""Serialization, allowlist gating, schema fingerprints (reference
test analog: ``AMQPEncryptionTest.scala`` round-trips +
``AMQPSerialization`` lookahead check)."""

import json

import pytest

from hyppo_worker_spark.model import (
    ConcurrencyWorkResource,
    DataIngestionJob,
    DataIngestionTask,
    DisallowedTypeError,
    FetchProcessedDataRequest,
    IngestionSource,
    IntegrationDetails,
    IntegrationSchema,
    PersistingSemantics,
    PersistProcessedDataRequest,
    ProcessRawDataRequest,
    RemoteProcessedDataFile,
    RemoteRawDataFile,
    RemoteStorageLocation,
    ThrottledWorkResource,
    compute_schema_fingerprint,
    deserialize_work,
    serialize_work,
)


def _details(**kw):
    defaults = dict(
        source_name="Test Source",
        version_number=1,
        is_raw_data_integration=False,
    )
    defaults.update(kw)
    return IntegrationDetails(**defaults)


def _task():
    job = DataIngestionJob(source=IngestionSource(name="Test Source"))
    return DataIngestionTask(job=job, task_number=1, task_arguments={"k": "v"})


def test_serialize_round_trip_with_nested_entities():
    item = FetchProcessedDataRequest(
        integration=_details(),
        task=_task(),
        resources=(
            ConcurrencyWorkResource(name="db", concurrency=2),
            ThrottledWorkResource(name="api", throttle_rate_ms=500),
        ),
    )
    back = deserialize_work(serialize_work(item))
    assert back == item
    assert back.task.job.source.name == "Test Source"
    assert back.resources[0].concurrency == 2
    assert back.resources[1].throttle_rate_ms == 500


def test_serialize_round_trip_raw_with_manifests():
    item = ProcessRawDataRequest(
        integration=_details(is_raw_data_integration=True),
        task=_task(),
        files=(
            RemoteRawDataFile(
                location=RemoteStorageLocation("/tmp", "a/b.raw.gz"),
                file_size=10,
                checksum="ff" * 16,
            ),
        ),
    )
    back = deserialize_work(serialize_work(item))
    assert back == item


def test_deserialize_rejects_unlisted_type():
    raw = json.dumps({"type": "os.system", "payload": {}})
    with pytest.raises(DisallowedTypeError):
        deserialize_work(raw)


def test_deserialize_rejects_response_types():
    raw = json.dumps({"type": "FailureResponse", "payload": {}})
    with pytest.raises(DisallowedTypeError):
        deserialize_work(raw)


def test_idempotency_flag():
    safe = PersistProcessedDataRequest(
        integration=_details(persisting_semantics=PersistingSemantics.IDEMPOTENT),
        task=_task(),
        data=RemoteProcessedDataFile(
            location=RemoteStorageLocation("/tmp", "x"),
            file_size=1,
            checksum="00",
            record_count=1,
        ),
    )
    unsafe = PersistProcessedDataRequest(
        integration=_details(persisting_semantics=PersistingSemantics.UNSAFE),
        task=safe.task,
        data=safe.data,
    )
    assert safe.idempotent
    assert not unsafe.idempotent
    assert FetchProcessedDataRequest(integration=_details(), task=_task()).idempotent


def test_schema_fingerprint_canonicalization():
    a = '{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}'
    b = '{ "fields": [ { "type": "int", "name": "x" } ], "name": "R", "type": "record" }'
    assert compute_schema_fingerprint(a) == compute_schema_fingerprint(b)
    s1 = IntegrationSchema(name="R", schema_json=a)
    s2 = IntegrationSchema(name="R", schema_json=b)
    assert s1.same_schema(s2)
    s3 = IntegrationSchema(name="R", schema_json=a.replace('"int"', '"long"'))
    assert not s1.same_schema(s3)


def test_sealed_envelope_round_trip():
    from hyppo_worker_spark import model as M

    item = FetchProcessedDataRequest(integration=_details(), task=_task())
    key = b"secret-key"
    sealed = M.seal_work(item, key)
    assert M.open_work(sealed, key) == item

    with pytest.raises(M.EnvelopeIntegrityError):
        M.open_work(sealed, b"wrong-key")

    # Flip one character of the payload portion (ciphertext in GCM mode,
    # JSON in HMAC mode) — authentication must fail either way.
    head, _, body = sealed.rpartition(".")
    pos = len(body) // 2
    flipped = body[:pos] + ("A" if body[pos] != "A" else "B") + body[pos + 1 :]
    with pytest.raises(M.EnvelopeIntegrityError):
        M.open_work(f"{head}.{flipped}", key)


def test_sealed_envelope_is_encrypted_when_crypto_available():
    from hyppo_worker_spark import model as M

    item = FetchProcessedDataRequest(integration=_details(), task=_task())
    sealed = M.seal_work(item, b"secret-key")
    if M._HAVE_CRYPTO:
        # Confidentiality parity with AMQPEncryption.scala: no plaintext
        # field values visible in the persisted envelope.
        assert sealed.startswith("gcm1.")
        assert "Test Source" not in sealed
    else:
        assert "." in sealed  # HMAC fallback: <hex sig>.<json>


def test_hmac_fallback_envelope_still_opens():
    """A stdlib-only producer's HMAC envelope opens under the same key
    even when cryptography is available on the consumer."""
    import hashlib
    import hmac as _hmac

    from hyppo_worker_spark import model as M

    item = FetchProcessedDataRequest(integration=_details(), task=_task())
    key = b"secret-key"
    body = M.serialize_work(item)
    sig = _hmac.new(key, body.encode(), hashlib.sha256).hexdigest()
    assert M.open_work(f"{sig}.{body}", key) == item
