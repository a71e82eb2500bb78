"""Multi-host bootstrap (parallel/bootstrap.py): single-process no-op,
coordinator retry, and failure surfacing (SURVEY.md §5.3/§5.8)."""
import pytest

from volumetricrenderer_tpu.parallel import bootstrap


@pytest.fixture(autouse=True)
def _reset(monkeypatch):
    monkeypatch.setattr(bootstrap, "_initialized", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "VOLT_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)


def test_single_process_noop():
    calls = []
    started = bootstrap.initialize_distributed(
        _initialize_fn=lambda **kw: calls.append(kw))
    assert started is False and calls == []


def test_retry_until_coordinator_up():
    attempts = []

    def flaky(**kw):
        attempts.append(kw)
        if len(attempts) < 3:
            raise ConnectionError("coordinator not up")

    started = bootstrap.initialize_distributed(
        coordinator_address="host0:1234", num_processes=2, process_id=1,
        retries=5, retry_delay_s=0.0, _initialize_fn=flaky)
    assert started is True
    assert len(attempts) == 3
    assert attempts[0]["coordinator_address"] == "host0:1234"
    assert attempts[0]["num_processes"] == 2
    assert attempts[0]["process_id"] == 1


def test_gives_up_after_retries():
    def always_down(**kw):
        raise ConnectionError("nope")

    with pytest.raises(RuntimeError, match="after 2 attempts"):
        bootstrap.initialize_distributed(
            coordinator_address="host0:1234", num_processes=2,
            process_id=1, retries=2, retry_delay_s=0.0,
            _initialize_fn=always_down)


def test_env_var_configuration(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "envhost:9")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    seen = {}

    def ok(**kw):
        seen.update(kw)

    assert bootstrap.initialize_distributed(_initialize_fn=ok,
                                            retries=1) is True
    assert seen["coordinator_address"] == "envhost:9"
    assert seen["num_processes"] == 4 and seen["process_id"] == 2


def test_process_summary_keys():
    s = bootstrap.process_summary()
    assert s["process_count"] == 1 and s["local_devices"] == 8
    assert s["backend"] == "cpu"


def test_volt_distributed_opt_in(monkeypatch):
    """VOLT_DISTRIBUTED=1 makes pod autodetection reachable: initialize()
    is called with no explicit config for jax.distributed to autodetect."""
    monkeypatch.setenv("VOLT_DISTRIBUTED", "1")
    seen = {}

    def ok(**kw):
        seen.update(kw)

    assert bootstrap.initialize_distributed(_initialize_fn=ok,
                                            retries=1) is True
    assert seen["coordinator_address"] is None
    assert seen["num_processes"] is None and seen["process_id"] is None
