package graft.queries

import graft.sources.CountryDim

/** DuckDB oracle for q43_multi_tracker_totals — the full two-tracker
  * wrangle (coal strict / hydro binational equal-share) + totals chain,
  * mirrored CTE-for-transform against the same synthetic inputs. The
  * country dimension is injected from [[CountryDim.duckValuesSql]] so
  * the two sides cannot drift. Verified cell-exact (48k rows) against
  * the Spark output at sf0.01.
  */
object Q43Oracle {
  val sql: String =
    "WITH cdim AS (SELECT * FROM " + CountryDim.duckValuesSql + "),\n" +
      """craw AS (
  SELECT
    'CU' || CAST(s_suppkey AS VARCHAR) AS unit_id,
    'CL' || CAST(s_suppkey // 4 AS VARCHAR) AS loc_id,
    'CPlant ' || CAST(s_suppkey // 4 AS VARCHAR) AS plant,
    (['Germany','France','Kosovo','Atlantis'])[n_nationkey % 4 + 1] AS country,
    'Region ' || CAST(n_regionkey AS VARCHAR) AS region,
    CASE s_suppkey % 3
      WHEN 0 THEN 'Alpha Corp [60%]; Beta GmbH [40%]'
      WHEN 1 THEN s_name || ' [100%]'
      ELSE s_name END AS owner,
    CASE WHEN s_suppkey % 13 = 0 THEN 'unknown'
      ELSE CAST(s_acctbal AS VARCHAR) END AS cap,
    (['operating','construction','announced','pre-construction','retired'])[s_suppkey % 5 + 1] AS status,
    CASE WHEN s_suppkey % 7 = 0 THEN 'not found'
      ELSE CAST(1990 + s_suppkey % 45 AS VARCHAR) END AS start_y,
    CASE WHEN s_suppkey % 6 = 0 THEN CAST(2015 + s_suppkey % 30 AS VARCHAR) END AS retire_y,
    CAST(s_suppkey % 50 AS VARCHAR) AS age,
    CAST(s_suppkey % 180 - 90 + (s_suppkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lat,
    CAST(s_suppkey % 360 - 180 + (s_suppkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lon
  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
cf1 AS (SELECT * FROM craw
  WHERE status IN ('construction','operating','announced','pre-construction')),
cf2 AS (SELECT * REPLACE (CASE WHEN cap = '>0' THEN 'unknown' ELSE cap END AS cap) FROM cf1),
cf3 AS (SELECT * FROM cf2
  WHERE NOT (cap IN ('unknown','N/A','not found') OR cap IS NULL OR cap = '0')),
cf4 AS (SELECT * FROM cf3
  WHERE NOT (start_y IN ('unknown','not found') OR start_y IS NULL)),
cnum AS (SELECT *, TRY_CAST(cap AS DOUBLE) AS capn, TRY_CAST(start_y AS DOUBLE) AS startn,
    TRY_CAST(retire_y AS DOUBLE) AS retiren FROM cf4),
csumm AS (SELECT loc_id,
    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lat) ELSE min(lat) END AS clat,
    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lon) ELSE min(lon) END AS clon
  FROM cnum GROUP BY loc_id),
ccanon AS (SELECT cnum.* EXCLUDE (lat, lon), s.clat AS lat, s.clon AS lon
  FROM cnum LEFT JOIN csumm s USING (loc_id)),
cf5 AS (SELECT * FROM ccanon WHERE retiren IS NULL OR retiren >= 2024),
cown AS (SELECT t.*, u.ow FROM cf5 t,
  unnest(coalesce(string_split_regex(t.owner, ';\s*'), [CAST(NULL AS VARCHAR)])) AS u(ow)),
cowns AS (SELECT *,
    NULLIF(trim(regexp_extract(ow, '^([^\[]+)', 1)), '') AS company,
    TRY_CAST(NULLIF(regexp_extract(ow, '(\d+)%', 1), '') AS DOUBLE) / 100 AS share
  FROM cown),
calloc AS (SELECT *, capn * share AS cap_alloc FROM cowns),
cex AS (SELECT a.*, y.year FROM calloc a
  CROSS JOIN (SELECT unnest(generate_series(2023, 2050)) AS year) y),
cval AS (SELECT *, CASE
    WHEN startn IS NOT NULL AND year < startn THEN 0.0
    WHEN retiren IS NOT NULL AND year >= retiren THEN 0.0
    ELSE cap_alloc END AS value FROM cex),
croll AS (SELECT loc_id, plant, country, region, lat, lon, 'CoalCap' AS technology,
    age, company, year, coalesce(sum(value), 0.0) AS capacity
  FROM cval GROUP BY loc_id, plant, country, region, lat, lon, age, company, year),
cfin AS (
  SELECT croll.loc_id AS asset_id, croll.plant AS asset_name,
    CAST(NULL AS VARCHAR) AS company_id, croll.company AS company_name,
    CASE WHEN croll.country = 'Kosovo' THEN 'XK' ELSE cd.iso2 END AS country_iso2,
    croll.country AS country_name, croll.region,
    coalesce(CAST(croll.lat AS VARCHAR), 'NA') || ', ' ||
      coalesce(CAST(croll.lon AS VARCHAR), 'NA') AS coordinates,
    CAST(NULL AS DOUBLE) AS workforce_size, CAST(NULL AS VARCHAR) AS workforce_source,
    'Power' AS sector, croll.technology, croll.capacity, 'MW' AS capacity_unit,
    croll.year AS production_year, TRY_CAST(croll.age AS DOUBLE) AS plant_age_years,
    CAST(NULL AS DOUBLE) AS plant_age_rank, CAST(NULL AS DOUBLE) AS capacity_factor,
    CAST(NULL AS DOUBLE) AS emission_factor
  FROM croll LEFT JOIN cdim cd ON croll.country = cd.country_name),
hraw AS (
  SELECT
    'HU' || CAST(c_custkey AS VARCHAR) AS unit_id,
    'HL' || CAST(c_custkey // 2 AS VARCHAR) AS loc_id,
    'HPlant ' || CAST(c_custkey // 2 AS VARCHAR) AS plant,
    (['Germany','France','Kosovo','Atlantis'])[n_nationkey % 4 + 1] AS c1,
    CASE WHEN c_custkey % 9 = 0
      THEN (['India','China','Brazil'])[n_nationkey % 3 + 1] END AS c2,
    CASE WHEN c_custkey % 9 = 0 THEN 'Yes' ELSE 'No' END AS bin,
    'Region ' || CAST(n_regionkey AS VARCHAR) AS r1,
    CASE WHEN c_custkey % 9 = 0 THEN 'Region2 ' || CAST(n_regionkey AS VARCHAR) END AS r2,
    CASE c_custkey % 4
      WHEN 0 THEN 'Gamma Inc; Delta LLC'
      WHEN 1 THEN c_name || ' [50%]; Epsilon AG'
      ELSE c_name END AS owner,
    CASE WHEN c_custkey % 11 = 0 THEN '>0'
      ELSE CAST(c_acctbal AS VARCHAR) END AS cap1,
    CASE WHEN c_custkey % 9 = 0 THEN CAST(c_acctbal / 2 AS VARCHAR) END AS cap2,
    (['operating','construction','announced','pre-construction','retired'])[c_custkey % 5 + 1] AS status,
    CASE WHEN c_custkey % 7 = 0 THEN 'not found'
      ELSE CAST(1995 + c_custkey % 30 AS VARCHAR) END AS start_y,
    CASE WHEN c_custkey % 8 = 0 THEN CAST(2010 + c_custkey % 25 AS VARCHAR) END AS retire_y,
    CAST(c_custkey % 170 - 85 + (c_custkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lat,
    CAST(c_custkey % 350 - 175 + (c_custkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lon
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
hexp AS (
  SELECT unit_id, loc_id, plant, c1, r1, owner, cap1, status, start_y, retire_y, lat, lon
  FROM hraw WHERE bin <> 'Yes' OR bin IS NULL
  UNION ALL
  SELECT unit_id, loc_id, plant, c1, r1, owner, cap1, status, start_y, retire_y, lat, lon
  FROM hraw WHERE bin = 'Yes'
  UNION ALL
  SELECT unit_id || '_2', loc_id || '_2', plant, c2, r2, owner, cap2, status,
    start_y, retire_y, lat, lon
  FROM hraw WHERE bin = 'Yes'),
hf1 AS (SELECT * FROM hexp
  WHERE status IN ('construction','operating','announced','pre-construction')),
hf2 AS (SELECT * REPLACE (CASE WHEN cap1 = '>0' THEN 'unknown' ELSE cap1 END AS cap1) FROM hf1),
hf3 AS (SELECT * FROM hf2
  WHERE NOT (cap1 IN ('unknown','N/A','not found') OR cap1 IS NULL OR cap1 = '0')),
himp AS (SELECT * REPLACE (
    CASE WHEN start_y IN ('unknown','not found') OR start_y IS NULL THEN
      CASE WHEN status IN ('announced','construction','pre-construction')
        THEN '2030' ELSE '2024' END
    ELSE start_y END AS start_y) FROM hf3),
hnum AS (SELECT *, TRY_CAST(cap1 AS DOUBLE) AS capn, TRY_CAST(start_y AS DOUBLE) AS startn,
    TRY_CAST(retire_y AS DOUBLE) AS retiren FROM himp),
-- hydro has NO pre-2024 retirement drop (only Coalplants_GEM.R:126-128 /
-- GasOilplants_GEM.R:153-155 have it); retirees stay as zero-capacity rows
hf5 AS (SELECT * FROM hnum),
hsumm AS (SELECT loc_id,
    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lat) ELSE min(lat) END AS clat,
    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lon) ELSE min(lon) END AS clon
  FROM hf5 GROUP BY loc_id),
hcanon AS (SELECT hf5.* EXCLUDE (lat, lon), s.clat AS lat, s.clon AS lon
  FROM hf5 LEFT JOIN hsumm s USING (loc_id)),
hown AS (SELECT t.*, u.ow FROM hcanon t,
  unnest(coalesce(string_split_regex(t.owner, ';\s*'), [CAST(NULL AS VARCHAR)])) AS u(ow)),
howns AS (SELECT *,
    NULLIF(trim(regexp_extract(ow, '^([^\[]+)', 1)), '') AS company,
    coalesce(
      TRY_CAST(NULLIF(regexp_extract(ow, '(\d+)%', 1), '') AS DOUBLE) / 100,
      1.0 / coalesce(len(string_split_regex(owner, ';\s*')), 1)) AS share
  FROM hown),
halloc AS (SELECT *, capn * share AS cap_alloc FROM howns),
hex AS (SELECT a.*, y.year FROM halloc a
  CROSS JOIN (SELECT unnest(generate_series(2023, 2050)) AS year) y),
hval AS (SELECT *, CASE
    WHEN startn IS NOT NULL AND year < startn THEN 0.0
    WHEN retiren IS NOT NULL AND year >= retiren THEN 0.0
    ELSE cap_alloc END AS value FROM hex),
hroll AS (SELECT loc_id, plant, c1 AS country, r1 AS region, lat, lon,
    'HydroCap' AS technology, company, year, coalesce(sum(value), 0.0) AS capacity
  FROM hval GROUP BY loc_id, plant, c1, r1, lat, lon, company, year),
hfin AS (
  SELECT hroll.loc_id AS asset_id, hroll.plant AS asset_name,
    CAST(NULL AS VARCHAR) AS company_id, hroll.company AS company_name,
    CASE WHEN hroll.country = 'Kosovo' THEN 'XK' ELSE cd.iso2 END AS country_iso2,
    hroll.country AS country_name, hroll.region,
    coalesce(CAST(hroll.lat AS VARCHAR), 'NA') || ', ' ||
      coalesce(CAST(hroll.lon AS VARCHAR), 'NA') AS coordinates,
    CAST(NULL AS DOUBLE) AS workforce_size, CAST(NULL AS VARCHAR) AS workforce_source,
    'Power' AS sector, hroll.technology, hroll.capacity, 'MW' AS capacity_unit,
    hroll.year AS production_year, CAST(NULL AS DOUBLE) AS plant_age_years,
    CAST(NULL AS DOUBLE) AS plant_age_rank, CAST(NULL AS DOUBLE) AS capacity_factor,
    CAST(NULL AS DOUBLE) AS emission_factor
  FROM hroll LEFT JOIN cdim cd ON hroll.country = cd.country_name),
steel AS (
  SELECT 'S' || CAST(r_regionkey AS VARCHAR) AS asset_id,
    'Steel ' || CAST(r_regionkey AS VARCHAR) AS asset_name,
    'STL' || CAST(r_regionkey AS VARCHAR) AS company_id,
    (['Alpha Corp','Gamma Inc','ZNoMatch'])[r_regionkey % 3 + 1] AS company_name,
    'US' AS country_iso2, 'United States' AS country_name,
    'Region ' || CAST(r_regionkey AS VARCHAR) AS region,
    '40.0, -75.0' AS coordinates, CAST(NULL AS DOUBLE) AS workforce_size,
    CAST(NULL AS VARCHAR) AS workforce_source, 'Power' AS sector,
    'SteelCap' AS technology, r_regionkey * 7.0 AS capacity,
    'MW' AS capacity_unit, 2030 AS production_year,
    CAST(NULL AS DOUBLE) AS plant_age_years, CAST(NULL AS DOUBLE) AS plant_age_rank,
    CAST(NULL AS DOUBLE) AS capacity_factor, CAST(NULL AS DOUBLE) AS emission_factor
  FROM region),
unioned AS (SELECT * FROM cfin UNION ALL SELECT * FROM hfin),
iddim AS (
  SELECT company_name,
    'TFL' || lpad(CAST(dense_rank() OVER (ORDER BY company_name)
      + 10000000 AS VARCHAR), 8, '0') AS new_id
  FROM (SELECT DISTINCT company_name FROM unioned WHERE company_name IS NOT NULL)),
withids AS (
  SELECT u.* REPLACE (coalesce(u.company_id, d.new_id) AS company_id)
  FROM unioned u LEFT JOIN iddim d USING (company_name)),
steeldim AS (
  SELECT company_name, company_id AS steel_id FROM (
    SELECT company_name, company_id,
      row_number() OVER (PARTITION BY company_name ORDER BY asset_id) AS rn
    FROM steel) WHERE rn = 1),
overlaid AS (
  SELECT w.* REPLACE (coalesce(sd.steel_id, w.company_id) AS company_id)
  FROM withids w LEFT JOIN steeldim sd USING (company_name)
  UNION ALL SELECT * FROM steel),
factors AS (
  SELECT (['CoalCap','GasCap'])[n_nationkey % 2 + 1] AS technology,
    (['DE','FR','XK'])[n_nationkey % 3 + 1] AS country_iso2,
    n_nationkey + 1.0 AS emissions_factor
  FROM nation),
percountry AS (
  SELECT technology, country_iso2, avg(emissions_factor) AS ef_country
  FROM factors GROUP BY 1, 2),
globalmean AS (
  SELECT technology, avg(ef_country) AS ef_global FROM percountry GROUP BY 1)
SELECT o.* REPLACE (
    CASE WHEN o.technology IN ('CoalCap', 'OilCap', 'GasCap')
      THEN coalesce(pc.ef_country, g.ef_global)
      ELSE 0.0 END AS emission_factor)
FROM overlaid o
LEFT JOIN percountry pc
  ON o.technology = pc.technology AND o.country_iso2 = pc.country_iso2
LEFT JOIN globalmean g ON o.technology = g.technology
ORDER BY asset_id, company_name NULLS FIRST, production_year, country_name,
  plant_age_years NULLS FIRST"""
}
