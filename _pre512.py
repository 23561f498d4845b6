import sys
sys.path.insert(0, "/root/repo")
from vllm_main_modify_tpu.benchmarks.microbench_int4 import run
run(t_sizes=(512, 2048), verbose=True)
