"""Checkpoint / resume for long renders.

The reference has NO checkpointing (SURVEY §5.4 — only the SIGHUP
partial-film dump, mitsuba.cpp:114-123). For long multi-host runs this
module persists the render state — film accumulator, pass counter, RNG
seed, photon/VRL maps, and optimizer parameters — via orbax, so a
preempted job resumes exactly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_render_state(path: str, film_acc, passes_done: int, seed: int,
                      aux=None, extra: Optional[Dict[str, Any]] = None):
    """Persist an in-progress render (callable between spp passes)."""
    state = {
        'film_acc': film_acc,
        'passes_done': np.int64(passes_done),
        'seed': np.int64(seed),
    }
    if aux is not None:
        state['aux'] = aux
    if extra:
        state['extra'] = extra
    _ckptr().save(os.path.abspath(path), state, force=True)


def load_render_state(path: str):
    """Returns the saved dict (film_acc/passes_done/seed[/aux/extra])."""
    return _ckptr().restore(os.path.abspath(path))


def render_with_checkpoints(scene, meta, seed: int = 0, spp=None,
                            integrator=None, ckpt_path: Optional[str] = None,
                            ckpt_every: int = 16):
    """Drop-in render() that checkpoints every ``ckpt_every`` passes and
    resumes from ``ckpt_path`` if present."""
    import jax.numpy as jnp
    from ..render import render_pass, preprocess
    from .. import film as film_mod

    spp = spp or meta.spp
    key = jax.random.PRNGKey(seed)
    start = 0
    acc = None
    aux = None
    if ckpt_path and os.path.exists(ckpt_path):
        st = load_render_state(ckpt_path)
        acc = jnp.asarray(st['film_acc'])
        start = int(st['passes_done'])
        aux = st.get('aux')
    if aux is None:
        aux = preprocess(scene, meta, seed, integrator)
    for p in range(start, spp):
        img, _ = render_pass(scene, meta, jax.random.fold_in(key, p),
                             integrator, aux, jnp.uint32(p))
        acc = img if acc is None else acc + img
        if ckpt_path and ((p + 1) % ckpt_every == 0 or p + 1 == spp):
            save_render_state(ckpt_path, np.asarray(acc), p + 1, seed)
    return film_mod.develop(acc)
