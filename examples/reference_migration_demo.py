"""Worked example: the reference pipeline's own workload, end-to-end on
this engine.

Reproduces the deployment described in SURVEY.md/FIXTURES.md — the four
live tables (SUBJECT_DETAILS, TEACHER_DETAILS, student, employee)
delivered as `<YYYYMMDD_HHMMSS>/<Table>.csv` increments, including every
documented edge case: BOM headers, first-row type traps (leading-zero
ints, negative ints, empty first cells, date strings), null rows,
duplicate rows, versioned re-delivery, header-only files.

Run:  python examples/reference_migration_demo.py [workdir]

What replaces what (SURVEY.md §3):
  S3 event + Lambda gate + DynamoDB   → watermark store + strictly-newer gate
  Lambda schema inference + MySQL DDL → first-row inference + parquet tables
  SQS FIFO + Step Functions + Glue    → IngestPipeline.ingest_root (one app)
  per-row SNS null alerts             → one bounded audit event per load
  per-row INSERT..ON DUPLICATE KEY    → set-based keyed upsert (merge)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SUBJECT_DETAILS_V1 = (
    "﻿AcademicYear,Subject,Class,Section,PrimaryTeacher,AssistantTeacher,LabTechnician\n"
    "2022-2023,Physics,11,A,Rao,Iyer,Khan\n"
    "2022-2023,Chemistry,11,A,Das,,Khan\n"  # null → audited, dropped
    "2022-2023,Maths,12,B,Rao,Iyer,Bose\n"
    "2022-2023,Maths,12,B,Rao,Iyer,Bose\n"  # duplicate → dedup
)
SUBJECT_DETAILS_V2 = (
    "AcademicYear,Subject,Class,Section,PrimaryTeacher,AssistantTeacher,LabTechnician\n"
    "2023-2024,Physics,11,A,Nair,Iyer,Khan\n"  # upsert over v1 Physics
    "2023-2024,Biology,11,C,Nair,Iyer,Khan\n"  # new row
)
TEACHER_DETAILS = (
    "TeacherId,TeacherName,DateOfJoining,DateOfBirth,HighestQualification,PinCode\n"
    "100001,Asha,03-06-2016,11-02-1988,Ph.D.,560001\n"  # dates stay VARCHAR
    "100002,Ravi,15-08-2019,01-12-1990,Masters,560002\n"
)
STUDENT = "StudentId,StudentName,Class,GPA\n00123,Meera,11,9.5\n204,Arun,12,8.75\n"
EMPLOYEE = "EmployeeId,EmployeeName,Salary\n-5,Kiran,50000.5\n7,Lata,61250.0\n"
HEADER_ONLY = "A,B,C\n"  # crashed the reference (StopIteration); we load 0 rows


def main() -> int:
    workdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    drops, wh = workdir / "drops", workdir / "warehouse"

    files = {
        ("20250108_075503", "SUBJECT_DETAILS.csv"): SUBJECT_DETAILS_V1,
        ("20250108_075503", "TEACHER_DETAILS.csv"): TEACHER_DETAILS,
        ("20250108_075504", "SUBJECT_DETAILS.csv"): SUBJECT_DETAILS_V2,
        ("20250108_075504", "student.csv"): STUDENT,
        ("20250108_075504", "employee.csv"): EMPLOYEE,
        ("20250108_075505", "empty_table.csv"): HEADER_ONLY,
    }
    for (folder, name), text in files.items():
        p = drops / folder / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text, encoding="utf-8")

    from end_to_end_aws_data_pipeline_spark.session import get_spark
    from end_to_end_aws_data_pipeline_spark.ingest.pipeline import IngestPipeline

    spark = get_spark("reference-migration-demo")
    events = []
    pipe = IngestPipeline(
        spark,
        str(wh),
        keys_by_table={
            "SUBJECT_DETAILS": ["Subject", "Class", "Section"],
            "TEACHER_DETAILS": ["TeacherId"],
            "student": ["StudentId"],
            "employee": ["EmployeeId"],
        },
        notifier=events.append,
    )

    print("=== deliveries ===")
    for r in pipe.ingest_root(str(drops)):
        audit = f" bad_rows={r.audit.n_bad_rows}/{r.audit.n_rows}" if r.audit else ""
        print(f"{r.status:18s} {r.table_name}@{r.folder_ts}{audit}")

    # re-run the whole root: every file must now be gated (idempotent)
    assert all(r.status == "skipped_not_newer" for r in pipe.ingest_root(str(drops)))
    print("re-run of all deliveries: fully gated (no-op) ✓")

    print("\n=== warehouse state ===")
    for t in ["SUBJECT_DETAILS", "TEACHER_DETAILS", "student", "employee"]:
        df = spark.read.parquet(str(wh / t))
        print(f"\n{t} ({df.count()} rows)  schema: {df.dtypes}")
        for row in df.orderBy(df.columns[0]).collect():
            print("   ", tuple(row))

    sd = {(r.Subject, r.AcademicYear) for r in spark.read.parquet(str(wh / "SUBJECT_DETAILS")).collect()}
    assert sd == {
        ("Physics", "2023-2024"),  # v2 replaced v1 on the same key
        ("Maths", "2022-2023"),
        ("Biology", "2023-2024"),
    }, sd
    stu = dict(spark.read.parquet(str(wh / "student")).select("StudentId", "StudentName").collect())
    assert stu == {123: "Meera", 204: "Arun"}  # "00123" → INTEGER (ref policy)
    emp = dict(spark.read.parquet(str(wh / "employee")).select("EmployeeName", "EmployeeId").collect())
    assert emp["Kiran"] == -5.0  # "-5" → FLOAT (isdigit False, ref policy)
    td = spark.read.parquet(str(wh / "TEACHER_DETAILS"))
    assert dict(td.dtypes)["DateOfJoining"] == "string"  # dates stay VARCHAR

    kinds = [e.kind for e in events]
    assert kinds.count("null_rows") == 1 and kinds.count("success") >= 5
    print("\nnull-row audit event:", events[kinds.index("null_rows")].payload["null_counts"])
    print("\nall reference-parity assertions passed ✓")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
