"""Demo driver at the repo root (reference main.py parity):
`python main.py` runs the bundled end-to-end demos."""

from hybridsearch_tpu.demo import run_demo

if __name__ == "__main__":
    run_demo()
