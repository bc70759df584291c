from .synth import (
    SiteSpec,
    FixtureSpec,
    generate_fixture,
    micro_spec,
    small_spec,
    bench_spec,
    steady_spec,
    steady_big_spec,
    dialects_spec,
    edge_spec,
    mail_spec,
)

__all__ = [
    "SiteSpec",
    "FixtureSpec",
    "generate_fixture",
    "micro_spec",
    "small_spec",
    "bench_spec",
    "steady_spec",
    "steady_big_spec",
    "dialects_spec",
    "edge_spec",
    "mail_spec",
]
