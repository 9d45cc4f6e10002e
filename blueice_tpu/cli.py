"""bluethaw: batch computation of delayed source PDF templates.

CLI role parity with the reference's bin/bluethaw (reference: bin/bluethaw:1-27):
thaw every pending task file in a directory, computing the templates into the
content-addressed cache, optionally on several worker processes. Run as
``python -m blueice_tpu.cli`` or via the ``bin/bluethaw`` script.
"""

import argparse
import sys

from .parallel.tasks import compute_all

__all__ = ['main']


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog='bluethaw',
        description="Compute blueice_tpu PDF templates from task files")
    parser.add_argument('--input', default='./pdf_tasks',
                        help="Directory with task files to compute")
    parser.add_argument('--output', default='./pdf_cache',
                        help="Directory for the computed template cache")
    parser.add_argument('--n_cpus', type=int, default=1,
                        help="Number of worker processes")
    args = parser.parse_args(argv)

    compute_all(args.input, args.n_cpus,
                task_dir=args.input, result_dir=args.output)
    return 0


if __name__ == '__main__':
    sys.exit(main())
