from ppasr_tpu.parallel.mesh import (make_mesh, param_shardings,
                                     batch_shardings)
