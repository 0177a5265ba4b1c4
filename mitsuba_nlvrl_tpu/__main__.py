"""Command-line renderer.

Analog of the reference CLI (src/mitsuba/mitsuba.cpp:34-73):

    python -m mitsuba_nlvrl_tpu scene.xml [-o out.exr] [-s SPP]
        [-D key=value ...] [--integrator NAME] [--res WxH] [--seed N]
        [--png preview.png] [-v]
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog='mitsuba_nlvrl_tpu',
        description='TPU-native differentiable renderer (Mitsuba-NLVRL '
                    'capabilities on JAX/XLA).')
    ap.add_argument('scene', help='Mitsuba XML scene file')
    ap.add_argument('-o', '--output', default=None,
                    help='output EXR path (default: scene name .exr)')
    ap.add_argument('-s', '--spp', type=int, default=None,
                    help='override samples per pixel')
    ap.add_argument('-D', dest='defines', action='append', default=[],
                    metavar='key=value',
                    help='scene parameter substitution ($key in XML)')
    ap.add_argument('--integrator', default=None,
                    help='override integrator type')
    ap.add_argument('--res', default=None, metavar='WxH',
                    help='override film resolution')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--spectral', action='store_true',
                    help='hero-wavelength spectral transport (the '
                         'reference *_spectral variant analog)')
    ap.add_argument('--png', default=None, help='also write a tonemapped PNG')
    ap.add_argument('--timeout', type=float, default=None, metavar='SEC',
                    help='stop rendering after SEC seconds and develop the '
                         'partial film (reference render_timeout semantics)')
    ap.add_argument('-v', '--verbose', action='store_true')
    args = ap.parse_args(argv)

    params = {}
    for d in args.defines:
        k, _, v = d.partition('=')
        params[k] = v

    from .scene.xml import load_file
    from .scene.builder import build_scene
    from .render import render
    from .utils.io import write_exr, write_png

    t0 = time.time()
    desc = load_file(args.scene, params)
    if args.integrator:
        desc.setdefault('integrator', {})['type'] = args.integrator
    if args.res:
        w, _, h = args.res.partition('x')
        desc['sensor']['film']['width'] = int(w)
        desc['sensor']['film']['height'] = int(h)
    if args.spectral:
        desc['spectral'] = True
    scene, meta = build_scene(desc)
    print(f'[load] {args.scene}: {meta.n_tris} tris, {meta.n_emitters} '
          f'emitters, {meta.n_media} media, integrator={meta.integrator} '
          f'({time.time() - t0:.2f}s)')

    out = args.output or os.path.splitext(args.scene)[0] + '.exr'

    # signal-driven cooperative control (reference mitsuba.cpp:114-123):
    # SIGHUP develops the partial film to the output path mid-render;
    # first SIGINT requests a graceful stop (partial develop + write),
    # a second SIGINT aborts hard.
    import signal
    import numpy as np
    flags = {'hup': False, 'int': 0}

    def _on_hup(sig, frm):
        flags['hup'] = True

    def _on_int(sig, frm):
        flags['int'] += 1
        if flags['int'] > 1:
            raise KeyboardInterrupt
        print('[signal] stop requested — finishing current pass, '
              'partial film will be developed (^C again to abort)')

    if hasattr(signal, 'SIGHUP'):
        signal.signal(signal.SIGHUP, _on_hup)
    signal.signal(signal.SIGINT, _on_int)

    def on_pass(p, develop):
        if flags['hup']:
            flags['hup'] = False
            write_exr(out, np.asarray(develop()))
            print(f'[signal] SIGHUP — partial film ({p + 1} passes) '
                  f'written to {out}')

    t0 = time.time()
    info = {}
    # two-pass integrators: precompute the photon/VRL maps here so the
    # postprocess stats dump (vrl.cpp:734-749 parity) can read them
    aux = None
    if args.verbose:
        from .render import preprocess
        aux = preprocess(scene, meta, seed=args.seed)
    img = render(scene, meta, seed=args.seed, spp=args.spp,
                 verbose=args.verbose, timeout=args.timeout,
                 should_stop=lambda: flags['int'] > 0,
                 on_pass=on_pass, info=info, aux=aux)
    img = np.asarray(img)
    tag = ' (PARTIAL)' if info.get('stopped_early') else ''
    print(f'[render] {meta.film.width}x{meta.film.height} '
          f'@ {info.get("passes_done", args.spp or meta.spp)}'
          f'/{args.spp or meta.spp} spp{tag}: {time.time() - t0:.2f}s '
          f'(mean {img.mean():.4f})')

    if aux is not None and hasattr(aux, 'vrl_count'):
        from .integrators.lighttrace import log_map_stats
        print('[stats]')
        log_map_stats(aux)

    write_exr(out, img)
    print(f'[write] {out}')
    if args.png:
        write_png(args.png, img)
        print(f'[write] {args.png}')


if __name__ == '__main__':
    main()
