"""Minimal DEAP-compatible shim (test-only) for executing the reference EA.

The reference's ensemble EA (reference utils/ensemble.py:206-272) is the one
code path never executed against ours: this environment has no `deap`
package, so the module-level try-import disables it. This shim
reimplements — faithfully, draw-for-draw where the operators consume the
stdlib ``random`` stream — exactly the DEAP 1.3 surface those lines touch:

- ``creator.create`` (class factory; class-valued kwargs instantiate
  per-instance, plain values become class attributes)
- ``base.Fitness`` (weighted-values tuple with lexicographic comparison,
  ``values`` property, ``del fitness.values``, ``valid``)
- ``base.Toolbox`` (``register`` = partial binding; default ``clone`` =
  ``copy.deepcopy``; default ``map`` = builtin ``map``)
- ``tools.initRepeat``, ``tools.selTournament`` (via ``selRandom`` =
  ``random.choice`` draws), ``tools.cxUniform``, ``tools.mutGaussian``,
  ``tools.HallOfFame``
- ``algorithms.varAnd``

RNG discipline matters for the oracle: every stochastic decision draws from
the global ``random`` module in the same order as the published DEAP
implementations, so the reference EA seeded with ``random.seed(s)`` runs the
same trajectory here that it would with the real library.

This file is PUBLIC-API reimplementation from the documented DEAP semantics
(the reference only vendors calls into it); it lives under tests/ because
our framework's EA (meme_challenge_tpu/ensemble/ensemble.py) is
self-contained and never imports this.
"""
from __future__ import annotations

import random
import types
from copy import deepcopy
from functools import partial
from itertools import repeat
from operator import attrgetter, eq, mul, truediv


# ------------------------------------------------------------------- base


class Fitness:
    """DEAP base.Fitness: values are stored pre-multiplied by ``weights``
    (``wvalues``) and compared lexicographically on the weighted tuple."""

    weights = ()

    def __init__(self, values=()):
        self.wvalues = ()
        if values:
            self.values = values

    def _get_values(self):
        return tuple(map(truediv, self.wvalues, self.weights))

    def _set_values(self, values):
        self.wvalues = tuple(map(mul, values, self.weights))

    def _del_values(self):
        self.wvalues = ()

    values = property(_get_values, _set_values, _del_values)

    @property
    def valid(self):
        return len(self.wvalues) != 0

    def __gt__(self, other):
        return self.wvalues > other.wvalues

    def __ge__(self, other):
        return self.wvalues >= other.wvalues

    def __lt__(self, other):
        return self.wvalues < other.wvalues

    def __le__(self, other):
        return self.wvalues <= other.wvalues

    def __eq__(self, other):
        return self.wvalues == other.wvalues

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return hash(self.wvalues)

    def __deepcopy__(self, memo):
        copy_ = self.__class__()
        copy_.wvalues = self.wvalues
        return copy_


class Toolbox:
    def __init__(self):
        self.register("clone", deepcopy)
        self.register("map", map)

    def register(self, alias, function, *args, **kwargs):
        pfunc = partial(function, *args, **kwargs)
        pfunc.__name__ = alias
        setattr(self, alias, pfunc)


# ----------------------------------------------------------------- creator


def _creator_create(name, base_cls, **kwargs):
    """DEAP creator.create: class-type kwargs become per-instance
    attributes (instantiated in ``__init__``), others class attributes."""
    dict_inst = {k: v for k, v in kwargs.items() if isinstance(v, type)}
    dict_cls = {k: v for k, v in kwargs.items() if not isinstance(v, type)}

    def __init__(self, *args, **kw):
        for attr, cls_ in dict_inst.items():
            setattr(self, attr, cls_())
        if base_cls is not object:
            base_cls.__init__(self, *args, **kw)

    new_cls = type(name, (base_cls,), {**dict_cls, "__init__": __init__})
    setattr(creator, name, new_cls)
    return new_cls


# ------------------------------------------------------------------- tools


def initRepeat(container, func, n):
    return container(func() for _ in range(n))


def selRandom(individuals, k):
    return [random.choice(individuals) for _ in range(k)]


def selTournament(individuals, k, tournsize, fit_attr="fitness"):
    chosen = []
    for _ in range(k):
        aspirants = selRandom(individuals, tournsize)
        chosen.append(max(aspirants, key=attrgetter(fit_attr)))
    return chosen


def cxUniform(ind1, ind2, indpb):
    size = min(len(ind1), len(ind2))
    for i in range(size):
        if random.random() < indpb:
            ind1[i], ind2[i] = ind2[i], ind1[i]
    return ind1, ind2


def mutGaussian(individual, mu, sigma, indpb):
    size = len(individual)
    if not isinstance(mu, (list, tuple)):
        mu = repeat(mu, size)
    if not isinstance(sigma, (list, tuple)):
        sigma = repeat(sigma, size)
    for i, m, s in zip(range(size), mu, sigma):
        if random.random() < indpb:
            individual[i] += random.gauss(m, s)
    return (individual,)


class HallOfFame:
    """DEAP tools.HallOfFame: items kept best-first; ``update`` inserts the
    first individual unconditionally when empty (DEAP quirk — it may carry
    an invalid fitness), then strictly better, non-similar individuals."""

    def __init__(self, maxsize, similar=eq):
        self.maxsize = maxsize
        self.keys = []
        self.items = []
        self.similar = similar

    def update(self, population):
        for ind in population:
            if len(self) == 0 and self.maxsize != 0:
                self.insert(population[0])
                continue
            if ind.fitness > self[-1].fitness or len(self) < self.maxsize:
                for hofer in self:
                    if self.similar(ind, hofer):
                        break
                else:
                    if len(self) >= self.maxsize:
                        self.remove(len(self) - 1)
                    self.insert(ind)

    def insert(self, item):
        import bisect

        item = deepcopy(item)
        i = bisect.bisect_right(self.keys, item.fitness)
        self.keys.insert(i, item.fitness)
        self.items.insert(len(self) - i, item)

    def remove(self, index):
        del self.keys[len(self) - (index % len(self) + 1)]
        del self.items[index]

    def __getitem__(self, i):
        return self.items[i]

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)


# -------------------------------------------------------------- algorithms


def varAnd(population, toolbox, cxpb, mutpb):
    offspring = [toolbox.clone(ind) for ind in population]
    for i in range(1, len(offspring), 2):
        if random.random() < cxpb:
            offspring[i - 1], offspring[i] = toolbox.mate(
                offspring[i - 1], offspring[i])
            del offspring[i - 1].fitness.values, offspring[i].fitness.values
    for i in range(len(offspring)):
        if random.random() < mutpb:
            (offspring[i],) = toolbox.mutate(offspring[i])
            del offspring[i].fitness.values
    return offspring


# ------------------------------------------------------- module namespaces

creator = types.ModuleType("deap.creator")
creator.create = _creator_create

base = types.ModuleType("deap.base")
base.Fitness = Fitness
base.Toolbox = Toolbox

tools = types.ModuleType("deap.tools")
tools.initRepeat = initRepeat
tools.selRandom = selRandom
tools.selTournament = selTournament
tools.cxUniform = cxUniform
tools.mutGaussian = mutGaussian
tools.HallOfFame = HallOfFame

algorithms = types.ModuleType("deap.algorithms")
algorithms.varAnd = varAnd


def install(module):
    """Bind the four DEAP namespaces into an already-imported reference
    module (the names ``from deap import creator, base, tools, algorithms``
    would have bound had the library been present). Returns a callable that
    restores the module's previous state."""
    saved = {n: module.__dict__.get(n, _MISSING)
             for n in ("creator", "base", "tools", "algorithms",
                       "EA_IMPORTED")}
    module.creator, module.base = creator, base
    module.tools, module.algorithms = tools, algorithms
    module.EA_IMPORTED = True

    def restore():
        for n, v in saved.items():
            if v is _MISSING:
                module.__dict__.pop(n, None)
            else:
                setattr(module, n, v)

    return restore


_MISSING = object()
