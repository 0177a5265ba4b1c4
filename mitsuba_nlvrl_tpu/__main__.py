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

    t0 = time.time()
    img = render(scene, meta, seed=args.seed, spp=args.spp,
                 verbose=args.verbose)
    import numpy as np
    img = np.asarray(img)
    print(f'[render] {meta.film.width}x{meta.film.height} '
          f'@ {args.spp or meta.spp} spp: {time.time() - t0:.2f}s '
          f'(mean {img.mean():.4f})')

    out = args.output or os.path.splitext(args.scene)[0] + '.exr'
    write_exr(out, img)
    print(f'[write] {out}')
    if args.png:
        write_png(args.png, img)
        print(f'[write] {args.png}')


if __name__ == '__main__':
    main()
