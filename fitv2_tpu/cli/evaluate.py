"""ADM-style metrics CLI: FID / sFID / IS / precision / recall.

The reference computes its published numbers by running the ADM evaluation
suite over two npz batches (reference fit/utils/evaluator.py — the vendored
guided-diffusion evaluator — invoked as `evaluator.py ref_batch.npz
sample_batch.npz`; README.md "Evaluation" section). This CLI is that
surface over the JAX evaluator (eval/evaluator.py):

    python -m fitv2_tpu.cli.evaluate ref_batch.npz samples.npz \\
        --inception-weights inception.safetensors [--weights-are-adm]

The ref batch may be an images npz (arr_0 uint8) or a precomputed-stats npz
(mu/sigma [+ mu_s/sigma_s]) as published by ADM. Without --weights-are-adm
the printed FID carries the non-comparability caveat (see
eval/evaluator.py FID_COMPARABILITY_NOTE).
"""

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('ref_batch', help='npz: arr_0 images, or mu/sigma stats')
    p.add_argument('sample_batch', help='npz with arr_0 uint8 images')
    p.add_argument('--inception-weights', default=None,
                   help='safetensors/pt InceptionV3 weights (pytorch-fid '
                        'layout); random weights if omitted')
    p.add_argument('--weights-are-adm', action='store_true',
                   help='attest the weights are the converted ADM '
                        'TF-Inception weights (enables comparability to '
                        'published numbers)')
    p.add_argument('--batch-size', type=int, default=64)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from fitv2_tpu.eval import statistics as stats
    from fitv2_tpu.eval.evaluator import Evaluator

    ev = Evaluator(inception_weights=args.inception_weights,
                   batch_size=args.batch_size,
                   weights_are_adm=args.weights_are_adm)

    samp = ev.read_activations(args.sample_batch)

    ref_npz = np.load(args.ref_batch)
    if 'mu' in ref_npz.files:
        # precomputed ADM reference statistics: FID/sFID only (pool acts
        # are unavailable, so precision/recall is skipped like the ADM
        # evaluator does when handed stats)
        mu_s, sig_s = stats.activation_statistics(samp['pool3'])
        out = {'fid': stats.frechet_distance(
            ref_npz['mu'], ref_npz['sigma'], mu_s, sig_s)}
        if 'mu_s' in ref_npz.files:
            mu_sp, sig_sp = stats.activation_statistics(samp['spatial'])
            out['sfid'] = stats.frechet_distance(
                ref_npz['mu_s'], ref_npz['sigma_s'], mu_sp, sig_sp)
        out['inception_score'] = stats.inception_score(samp['softmax'])
    else:
        ref = ev.read_activations(args.ref_batch)
        out = stats.compute_all_metrics(
            ref['pool3'], ref['spatial'], samp['pool3'], samp['spatial'],
            samp['softmax'])
    out['comparable_to_published'] = ev.comparable_to_published
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == '__main__':
    main()
