from pnpflow_tpu.data.datasets import DataLoaders
