from .tasks import (compute_single, compute_many, compute_all,
                    create_models_ipyparallel)
