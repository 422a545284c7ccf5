"""Model graph: named variables + dependence edges.

Reference: src/variables/variables.jl (Constant/Hyperparameter, Data,
Transformation, Parameter vertex types with Deterministic/Random
sampleability), src/variables/dependencies.jl (edges),
src/models/GenericModel.jl (the digraph container with `ofkey` lookup and
`model2dot` graphviz export), src/models/generators.jl
(`likelihood_model`).

JAX re-design: variables are *static descriptors* (frozen dataclasses);
runtime values live in a plain ``{key: array}`` dict threaded through the
compiled Gibbs sweep.  User functions receive that dict instead of the
reference's positional `v::Vector` + `nkeys` indexing convention
(e.g. doc/examples/swiss/MALA/analytical.jl uses v[1], v[2]... — here
``values['X']`` etc.).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class Variable:
    """Graph vertex (reference variables.jl:11: key + index)."""

    key: str

    dotshape = "box"
    is_random = False
    is_dependent = False  # updated during a Gibbs sweep?


@dataclasses.dataclass(frozen=True)
class Constant(Variable):
    """Deterministic root vertex (reference variables.jl:63-80)."""

    dotshape = "trapezium"


# reference: `const Hyperparameter = Constant` (variables.jl:80)
Hyperparameter = Constant


@dataclasses.dataclass(frozen=True)
class Data(Variable):
    """Observed-data vertex (reference variables.jl:84-92).

    ``update(values) -> new value`` is the reference's optional per-sweep
    refresh hook (variables.jl:87; the reference declares it but never
    invokes it — here GibbsJob applies it at the START of every sweep,
    before any block, e.g. for streaming-data or data-augmentation
    schemes)."""

    update: Optional[Callable[[Dict[str, Any]], Any]] = None

    dotshape = "box"


@dataclasses.dataclass(frozen=True)
class Transformation(Variable):
    """Deterministic function of parent values
    (reference variables.jl:104-115)."""

    transform: Callable[[Dict[str, Any]], Any] = None

    dotshape = "polygon"
    is_dependent = True


@dataclasses.dataclass(frozen=True)
class GibbsParameter(Variable):
    """Random vertex (reference parameters.jl:5).

    Exactly one of:
      * ``setpdf(values) -> Distribution``   — full conditional, drawn
        directly each sweep (reference BasicGibbsJob.jl:192-193);
      * ``logtarget(x, values) -> scalar``   — unnormalised conditional
        log-density, sampled by a nested MCMC kernel
        (MCMC-within-Gibbs, reference BasicGibbsJob.jl:188-190).
        ``loglikelihood``/``logprior`` may be supplied instead and are
        summed (reference BasicContMuvParameter.jl:174-201).

    ``setprior(values) -> Distribution`` optionally supplies the prior as
    a samplable distribution — used by ``Nested(reset_from_prior=True)``
    to redraw nested-job starts each sweep (reference ``setprior!`` +
    ``resetpstate``, parameters.jl:15-19, BasicGibbsJob.jl:158-168).
    """

    setpdf: Optional[Callable] = None
    logtarget: Optional[Callable] = None
    loglikelihood: Optional[Callable] = None
    logprior: Optional[Callable] = None
    setprior: Optional[Callable] = None

    dotshape = "circle"
    is_random = True
    is_dependent = True

    def conditional_logdensity(self, x, values: Dict[str, Any]):
        if self.logtarget is not None:
            return self.logtarget(x, values)
        if self.loglikelihood is not None and self.logprior is not None:
            return self.loglikelihood(x, values) + self.logprior(x, values)
        if self.setpdf is not None:
            import jax.numpy as jnp

            return jnp.sum(self.setpdf(values).logpdf(x))
        raise ValueError(f"parameter {self.key!r} has no density specification")


# convenient alias matching the single-parameter API naming
Parameter = GibbsParameter


class GenericModel:
    """Lightweight digraph of variables (reference GenericModel.jl:1-185).

    ``edges`` are (source_key, target_key) pairs.  ``model[key]`` looks a
    vertex up (reference GenericModel.jl:10 `m[:key]`).
    """

    def __init__(
        self,
        vertices: Sequence[Variable],
        edges: Sequence[Tuple[str, str]] = (),
        isdirected: bool = True,
        isindexed: bool = False,
    ):
        self.vertices = list(vertices)
        self.edges = list(edges)
        self.isdirected = isdirected
        self.ofkey = {v.key: i for i, v in enumerate(self.vertices)}
        if len(self.ofkey) != len(self.vertices):
            raise ValueError("duplicate vertex keys")
        for s, t in self.edges:
            if s not in self.ofkey or t not in self.ofkey:
                raise ValueError(f"edge ({s},{t}) references unknown vertex")

    def __getitem__(self, key: str) -> Variable:
        return self.vertices[self.ofkey[key]]

    def __contains__(self, key: str) -> bool:
        return key in self.ofkey

    def add_vertex(self, v: Variable):
        if v.key in self.ofkey:
            raise ValueError(f"duplicate vertex {v.key!r}")
        self.ofkey[v.key] = len(self.vertices)
        self.vertices.append(v)

    def add_edge(self, source: str, target: str):
        self.edges.append((source, target))

    @property
    def parameters(self):
        return [v for v in self.vertices if isinstance(v, GibbsParameter)]

    @property
    def dependents(self):
        """Parameters + Transformations in vertex order — the Gibbs sweep
        order (reference BasicGibbsJob.jl `dpindex`)."""
        return [v for v in self.vertices if v.is_dependent]

    def parents_of(self, key: str):
        return [s for (s, t) in self.edges if t == key]

    def children_of(self, key: str):
        return [t for (s, t) in self.edges if s == key]

    def to_dot(self, name: str = "model") -> str:
        """Graphviz export (reference `model2dot`, GenericModel.jl:164-185)."""
        lines = [f"digraph {name} {{"]
        for v in self.vertices:
            lines.append(f'  "{v.key}" [shape={v.dotshape}];')
        for s, t in self.edges:
            lines.append(f'  "{s}" -> "{t}";')
        lines.append("}")
        return "\n".join(lines)


def likelihood_model(variables, isindexed: bool = False) -> GenericModel:
    """Add an edge from every non-parameter to every parameter
    (reference src/models/generators.jl:5-18)."""
    if isinstance(variables, Variable):
        variables = [variables]
    edges = [
        (v.key, p.key)
        for v in variables
        if not isinstance(v, GibbsParameter)
        for p in variables
        if isinstance(p, GibbsParameter)
    ]
    return GenericModel(variables, edges, isindexed=isindexed)
