from .synth import SiteSpec, FixtureSpec, generate_fixture, micro_spec, small_spec, bench_spec

__all__ = [
    "SiteSpec",
    "FixtureSpec",
    "generate_fixture",
    "micro_spec",
    "small_spec",
    "bench_spec",
]


import forum_dl_ray as _fdr

_fdr.ship_by_value()
