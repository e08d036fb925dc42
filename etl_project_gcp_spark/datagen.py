"""Reference-shaped synthetic business data (S9 — data_generator.py:61-230).

Generates employees / products / sales tables with the reference
generator's shapes and distributions (FIXTURES.md §2): weighted
categorical draws, seasonal date skew, level-banded salaries, nullable
FKs, and deliberately dirty rows (whitespace names, mixed-case emails,
non-positive amounts) so the silver layer's filters have work to do.

Spark-native and fully deterministic WITHOUT randomness state: every
value is a pure function of the row id via xxhash64(id, tag) — the
distributed-safe alternative to seeded RNG (same output for any
partitioning, any executor count; SURVEY §7 hard-part #5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DEPARTMENTS = (
    "Engineering", "Sales", "Marketing", "Finance", "HR", "Operations",
    "Customer Success", "Legal", "Product", "Design", "IT", "Data",
)
JOB_LEVELS = ("Intern", "Junior", "Mid", "Senior", "Staff", "Principal", "Director")
LOCATIONS = (
    "New York", "San Francisco", "Austin", "Chicago",
    "Seattle", "Boston", "Denver", "Miami",
)
FIRST_NAMES = (
    "Alex", "Sam", "Jordan", "Taylor", "Morgan", "Casey", "Riley", "Avery",
    "Quinn", "Dana", "Jamie", "Robin", "Drew", "Blake", "Cameron", "Devon",
    "Elliot", "Frankie", "Harper", "Izzy",
)
LAST_NAMES = (
    "Smith", "Johnson", "Lee", "Brown", "Garcia", "Miller", "Davis",
    "Martinez", "Wilson", "Anderson", "Thomas", "Moore", "Jackson",
    "Martin", "Thompson", "White", "Lopez", "Clark", "Lewis", "Walker",
)
CATEGORIES = (
    "Electronics", "Clothing", "Home", "Sports", "Books",
    "Toys", "Beauty", "Garden", "Automotive", "Grocery",
)
CHANNELS = ("Online", "Store", "Mobile", "Phone", "Partner")
REGIONS = ("North", "South", "East", "West")
SEGMENTS = ("Enterprise", "SMB", "Consumer", "Government", "Education")
PAYMENT_METHODS = ("Card", "Cash", "Transfer", "Wallet")
WORK_TYPES = ("Full-time", "Part-time", "Contract")
STATUSES = ("Completed", "Pending", "Cancelled")


def _h(tag: str) -> F.Column:
    """Deterministic 63-bit non-negative hash of the row id for ``tag``."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(tag)))


def _pick(tag: str, pool: tuple[str, ...]) -> F.Column:
    return F.element_at(F.array(*[F.lit(v) for v in pool]), (_h(tag) % len(pool) + 1).cast("int"))


def _uniform(tag: str) -> F.Column:
    """Deterministic uniform in [0, 1)."""
    return (_h(tag) % 1_000_000) / 1_000_000.0


def _weighted(tag: str, values: tuple, weights: tuple[int, ...]) -> F.Column:
    """Weighted categorical draw (random.choices parity —
    data_generator.py:186-189)."""
    total = sum(weights)
    u = _h(tag) % total
    acc = 0
    conds = []
    for v, w in zip(values, weights):
        acc += w
        conds.append((u < acc, v))
    expr = F.lit(values[-1])
    for cond, v in reversed(conds):
        expr = F.when(cond, F.lit(v)).otherwise(expr)
    return expr


def gen_employees(spark: SparkSession, n: int = 250) -> DataFrame:
    """employees table (data_generator.py:95-114 shape) with dirty rows:
    ~10% whitespace-padded names, ~5% NULL emails, ~3% non-positive
    salaries, ~10% NULL manager_id, ~90% active."""
    df = spark.range(n)
    first = _pick("first", FIRST_NAMES)
    last = _pick("last", LAST_NAMES)
    pad_first = F.when(_h("pad") % 10 == 0, F.concat(F.lit("  "), first, F.lit(" "))).otherwise(first)
    email_raw = F.concat(first, F.lit("."), last, F.lit("@corp.example.com"))
    email_cased = F.when(_h("ecase") % 3 == 0, F.upper(email_raw)).otherwise(email_raw)
    email = F.when(_h("enull") % 20 == 0, F.lit(None)).otherwise(
        F.when(_h("epad") % 7 == 0, F.concat(F.lit(" "), email_cased, F.lit(" "))).otherwise(email_cased)
    )
    level = _pick("level", JOB_LEVELS)
    level_rank = F.array_position(F.array(*[F.lit(v) for v in JOB_LEVELS]), level)
    salary = F.when(_h("sneg") % 33 == 0, F.lit(-1000.0)).otherwise(
        F.round(30000 + level_rank * 15000 + _uniform("sal") * 10000, 2)
    )
    hire_date = F.date_add(F.lit("2015-01-01").cast("date"), (_h("hire") % 3650).cast("int"))
    return df.select(
        F.format_string("EMP-%05d", F.col("id") + 1).alias("employee_id"),
        pad_first.alias("first_name"),
        last.alias("last_name"),
        F.concat(first, F.lit(" "), last).alias("full_name"),
        email.alias("email"),
        _pick("dept", DEPARTMENTS).alias("department"),
        F.concat(level, F.lit(" "), _pick("dept", DEPARTMENTS)).alias("job_title"),
        level.alias("job_level"),
        _pick("loc", LOCATIONS).alias("location"),
        hire_date.alias("hire_date"),
        F.when(_h("promo") % 10 < 3, F.lit(None).cast("date")).otherwise(
            F.date_add(hire_date, 365)
        ).alias("last_promotion_date"),
        salary.alias("salary"),
        F.format_string("+1-555-%07d", (_h("phone") % 10_000_000).cast("int")).alias("phone"),
        F.when(_h("mgr") % 10 == 0, F.lit(None).cast("string")).otherwise(
            F.format_string("EMP-%05d", (_h("mgrid") % n + 1).cast("int"))
        ).alias("manager_id"),
        F.round(2.5 + (_h("rating") % 26) / 10.0, 1).alias("performance_rating"),
        (_h("active") % 10 < 9).alias("is_active"),
        _pick("wt", WORK_TYPES).alias("work_type"),
        F.lit("2024-01-15 12:00:00").cast("timestamp").alias("created_at"),
    )


def gen_products(spark: SparkSession, n: int = 30) -> DataFrame:
    """products table (data_generator.py:147-162 shape): category-banded
    prices, cost = 0.3-0.7 × price, ~7% non-positive prices, ~80% active."""
    df = spark.range(n)
    category = _pick("cat", CATEGORIES)
    cat_rank = F.array_position(F.array(*[F.lit(v) for v in CATEGORIES]), category)
    base_price = F.round(10 + cat_rank * 50 + _uniform("price") * 200, 2)
    price = F.when(_h("pneg") % 15 == 0, F.lit(0.0)).otherwise(base_price)
    return df.select(
        F.format_string("PRD-%05d", F.col("id") + 1).alias("product_id"),
        F.concat(F.lit("Product "), category, F.lit(" #"), F.col("id") + 1).alias("product_name"),
        category.alias("category"),
        F.concat(category, F.lit("/Sub"), (_h("sub") % 3 + 1).cast("int")).alias("subcategory"),
        price.alias("price"),
        F.round(base_price * (0.3 + _uniform("margin") * 0.4), 2).alias("cost"),
        F.concat(F.lit("Supplier-"), (_h("supp") % 10 + 1).cast("int")).alias("supplier"),
        F.date_add(F.lit("2020-01-01").cast("date"), (_h("launch") % 1500).cast("int")).alias("launch_date"),
        (_h("pactive") % 10 < 8).alias("is_active"),
        (_h("stock") % 1001).cast("bigint").alias("stock_quantity"),
        F.round(0.1 + _uniform("wt") * 20, 2).alias("weight_kg"),
        F.round(2.0 + (_h("prat") % 31) / 10.0, 1).alias("rating"),
        (_h("rev") % 501).cast("bigint").alias("reviews_count"),
        F.lit("2024-01-15 12:00:00").cast("timestamp").alias("created_at"),
    )


def gen_sales(
    spark: SparkSession,
    employees: DataFrame,
    products: DataFrame,
    n: int = 500,
    n_products: int = 30,
) -> DataFrame:
    """sales fact table (data_generator.py:206-227 shape): weighted
    quantity/discount draws, seasonal skew (30% of sales in the last two
    months — data_generator.py:179-182), nullable sales_rep_id drawn
    from Sales/Customer Success employees only (:174-175), ~3% dirty
    non-positive quantities/amounts."""
    reps = (
        employees.filter(F.col("department").isin("Sales", "Customer Success"))
        .select(F.col("employee_id").alias("rep_id"))
        .withColumn("rep_idx", F.row_number().over(W.orderBy("rep_id")) - 1)
    )
    n_reps = reps.count()
    df = spark.range(n)
    quantity_clean = _weighted("qty", (1, 2, 3, 4, 5, 10, 25, 50), (30, 25, 15, 10, 8, 6, 4, 2))
    quantity = F.when(_h("qneg") % 33 == 0, F.lit(0)).otherwise(quantity_clean).cast("bigint")
    unit_price = F.round(5 + _uniform("uprice") * 500, 2)
    discount_pct = _weighted("disc", (0, 5, 10, 15, 20), (40, 25, 15, 12, 8)).cast("bigint")
    final_unit_price = F.round(unit_price * (1 - discount_pct / 100), 2)
    total_raw = F.round(final_unit_price * quantity, 2)
    total_amount = F.when(_h("tneg") % 50 == 0, F.lit(-5.0)).otherwise(total_raw)
    # seasonal skew: 30% of sales in the last 2 months of the year window
    sale_date = F.when(
        _h("season") % 10 < 3,
        F.date_add(F.lit("2023-11-01").cast("date"), (_h("sd1") % 61).cast("int")),
    ).otherwise(
        F.date_add(F.lit("2023-01-01").cast("date"), (_h("sd2") % 304).cast("int"))
    )
    base = df.select(
        F.col("id"),
        F.format_string("TXN-%08d", F.col("id") + 1).alias("transaction_id"),
        F.format_string("PRD-%05d", (_h("prod") % n_products + 1).cast("int")).alias("product_id"),
        _pick("cseg", SEGMENTS).alias("customer_segment"),
        F.concat(_pick("cfirst", FIRST_NAMES), F.lit(" "), _pick("clast", LAST_NAMES)).alias("customer_name"),
        F.concat(_pick("cfirst", FIRST_NAMES), F.lit("@customer.example.com")).alias("customer_email"),
        (F.when(_h("repnull") % 5 == 0, F.lit(None).cast("int"))
         .otherwise((_h("repidx") % F.lit(max(n_reps, 1))).cast("int"))).alias("rep_idx"),
        sale_date.alias("sale_date"),
        quantity.alias("quantity"),
        unit_price.alias("unit_price"),
        discount_pct.alias("discount_pct"),
        final_unit_price.alias("final_unit_price"),
        total_amount.alias("total_amount"),
        _weighted("chan", CHANNELS, (35, 30, 20, 10, 5)).alias("channel"),
        _pick("region", REGIONS).alias("region"),
        _pick("pay", PAYMENT_METHODS).alias("payment_method"),
        F.when(_h("ship") % 10 < 3, F.lit(0.0)).otherwise(F.round(_uniform("shipc") * 25, 2)).alias("shipping_cost"),
        _weighted("status", STATUSES, (85, 10, 5)).alias("status"),
        F.lit("2024-01-15 12:00:00").cast("timestamp").alias("created_at"),
    )
    out = (
        base.join(F.broadcast(reps), base.rep_idx == reps.rep_idx, "left")
        .withColumn("sales_rep_id", F.col("rep_id"))
        .drop("rep_idx", "rep_id", "id")
        # denormalized product_name/category copied onto the sale row,
        # as the reference generator does (data_generator.py:208-211)
        .join(F.broadcast(products.select("product_id", "product_name", "category")),
              "product_id", "left")
    )
    # match reference column order (data_generator.py:206-227)
    return out.select(
        "transaction_id", "product_id", "product_name", "category",
        "customer_name", "customer_email", "customer_segment",
        "sales_rep_id", "sale_date", "quantity", "unit_price",
        "discount_pct", "final_unit_price", "total_amount", "channel",
        "region", "payment_method", "shipping_cost", "status", "created_at",
    )


def write_fixture_csvs(spark: SparkSession, out_dir: str, n_employees: int = 250,
                       n_products: int = 30, n_sales: int = 500) -> dict[str, str]:
    """Land the three tables as single-file CSVs (the reference's GCS
    landing zone shape — data_generator.py:280-311)."""
    emp = gen_employees(spark, n_employees)
    prod = gen_products(spark, n_products)
    sales = gen_sales(spark, emp, prod, n_sales, n_products)
    paths = {}
    for name, df in [("employees", emp), ("products", prod), ("sales", sales)]:
        path = f"{out_dir}/{name}"
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        paths[name] = path
    return paths
