"""Convert a row of all_test_results_new.csv into a one-metric-per-line
column, grouped by dataset, for pasting into a spreadsheet (reference
scripts/result_to_col.py).

Usage: python scripts/result_to_col.py <csv_path> [row_index=-1]
"""
import sys

from _registry import SEQUENCES  # noqa: F401  (shared sequence registry)


def main(csv_path: str, row: int = -1) -> None:
    with open(csv_path) as f:
        lines = [l.strip() for l in f if l.strip()]
    header = lines[0].split(",")
    values = lines[row].split(",")
    table = dict(zip(header, values))
    print("Checkpoint:", values[0])
    for ds, seqs in SEQUENCES.items():
        for metric in ("MSE", "SSIM", "LPIPS"):
            print(f"# {ds}/{metric}")
            for seq in seqs:
                print(table.get(f"{ds}/{seq}/{metric}", ""))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else -1)
