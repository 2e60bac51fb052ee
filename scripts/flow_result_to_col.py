"""Flow-metric variant of result_to_col.py (reference
scripts/flow_result_to_col.py).

Usage: python scripts/flow_result_to_col.py <csv_path> [row_index=-1]
"""
import sys

from _registry import FLOW_METRICS, FLOW_SEQUENCES


def main(csv_path: str, row: int = -1) -> None:
    with open(csv_path) as f:
        lines = [l.strip() for l in f if l.strip()]
    header = lines[0].split(",")
    values = lines[row].split(",")
    table = dict(zip(header, values))
    print("Checkpoint:", values[0])
    for ds, seqs in FLOW_SEQUENCES.items():
        for metric in FLOW_METRICS:
            print(f"# {ds}/{metric}")
            for seq in seqs:
                print(table.get(f"{ds}/{seq}/{metric}", ""))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else -1)
