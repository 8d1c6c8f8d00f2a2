"""A20 health/readiness: tri-state rollup + 503 mapping via injected
component failures (reference api/routes/health.py:44-127 semantics)."""

from __future__ import annotations

from iceberg_explorer_spark.service.health import (
    DEGRADED,
    HEALTHY,
    UNHEALTHY,
    HealthService,
)


def _boom() -> None:
    raise RuntimeError("injected failure")


def _ok() -> None:
    pass


def test_healthy_all_components_green(spark):
    svc = HealthService(spark)
    report = svc.health()
    assert report.status == HEALTHY
    assert report.http_status == 200
    assert all(c.healthy for c in report.components.values())
    assert set(report.components) == {"engine", "catalog"}


def test_degraded_when_one_component_fails(spark):
    svc = HealthService(spark, checks={"engine": _ok, "catalog": _boom})
    report = svc.health()
    assert report.status == DEGRADED
    assert report.http_status == 503
    assert report.components["engine"].healthy
    assert not report.components["catalog"].healthy
    assert "injected failure" in report.components["catalog"].error


def test_unhealthy_when_all_components_fail(spark):
    svc = HealthService(spark, checks={"engine": _boom, "catalog": _boom})
    report = svc.health()
    assert report.status == UNHEALTHY
    assert report.http_status == 503


def test_ready_when_healthy(spark):
    ready = HealthService(spark).ready()
    assert ready.ready and ready.http_status == 200 and ready.reason is None


def test_not_ready_when_degraded(spark):
    svc = HealthService(spark, checks={"engine": _ok, "catalog": _boom})
    ready = svc.ready()
    assert not ready.ready
    assert ready.http_status == 503
    assert "catalog" in ready.reason and "injected failure" in ready.reason


def test_not_ready_when_engine_uninitialized():
    ready = HealthService(spark=None).ready()
    assert not ready.ready
    assert ready.http_status == 503
    assert ready.reason == "Engine not initialized"


def test_uninitialized_engine_health_is_unhealthy():
    report = HealthService(spark=None).health()
    assert report.status == UNHEALTHY
    assert report.http_status == 503
