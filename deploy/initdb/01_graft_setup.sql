-- graft smoke-test schema: two demo tables, the change table the JDBC
-- polling source reads (schema = graft.sources.jdbc.JdbcCdcSource.schema),
-- a capture trigger, and the publication the WAL lane's fail-fast checks.
-- Mirrors the reference's setup task (demo tables + publication + identity).

CREATE TABLE user_account (
  id         BIGSERIAL PRIMARY KEY,
  email      TEXT NOT NULL,
  val_cents  BIGINT NOT NULL DEFAULT 0,
  updated_at TIMESTAMPTZ NOT NULL DEFAULT now()
);
CREATE TABLE todo (
  id         BIGSERIAL PRIMARY KEY,
  user_id    BIGINT REFERENCES user_account (id),
  title      TEXT NOT NULL,
  done       BOOLEAN NOT NULL DEFAULT false,
  updated_at TIMESTAMPTZ NOT NULL DEFAULT now()
);

-- full old images on UPDATE/DELETE (reference README recommends FULL)
ALTER TABLE user_account REPLICA IDENTITY FULL;
ALTER TABLE todo REPLICA IDENTITY FULL;

-- the publication the pgoutput/WAL lane subscribes to (S2 fail-fast)
CREATE PUBLICATION graft_pub FOR TABLE user_account, todo;

-- change table: the JDBC lane's wire schema, indexed on the watermark
CREATE TABLE graft_changes (
  seq                  BIGSERIAL PRIMARY KEY,
  lsn                  BIGINT NOT NULL,
  xid                  BIGINT,
  op                   TEXT NOT NULL,
  schema_name          TEXT,
  table_name           TEXT,
  commit_ts_us         BIGINT,
  record_json          TEXT,
  old_record_json      TEXT,
  old_kind             TEXT,
  toast_unchanged_json TEXT,
  col_types_json       TEXT
);
CREATE INDEX graft_changes_lsn ON graft_changes (lsn);

-- Trigger capture: all-text JSON (jsonb_each_text) so the stream's
-- map<string,string> parse sees text cells, like the pgoutput wire format.
--
-- SMOKE-TEST ONLY caveat: lsn/seq are assigned at INSERT time, so a
-- long-running transaction can commit rows below an already-delivered
-- watermark, which high-watermark polling will then never re-read (the
-- documented monotone-visibility assumption in JdbcCdcSource). Production
-- change tables should be written by a logical-decoding consumer
-- (commit-ordered LSNs) — e.g. a pgoutput client draining graft_pub.
CREATE OR REPLACE FUNCTION graft_capture() RETURNS trigger AS $$
DECLARE
  rec     TEXT;
  old_rec TEXT;
BEGIN
  IF TG_OP <> 'DELETE' THEN
    SELECT jsonb_object_agg(key, value)::text INTO rec
    FROM jsonb_each_text(to_jsonb(NEW));
  END IF;
  IF TG_OP <> 'INSERT' THEN
    SELECT jsonb_object_agg(key, value)::text INTO old_rec
    FROM jsonb_each_text(to_jsonb(OLD));
  END IF;
  INSERT INTO graft_changes
    (lsn, xid, op, schema_name, table_name, commit_ts_us,
     record_json, old_record_json, old_kind)
  VALUES
    (pg_wal_lsn_diff(pg_current_wal_lsn(), '0/0')::bigint,
     txid_current(),
     lower(TG_OP),
     TG_TABLE_SCHEMA, TG_TABLE_NAME,
     (extract(epoch FROM clock_timestamp()) * 1000000)::bigint,
     rec, old_rec,
     CASE WHEN TG_OP = 'INSERT' THEN NULL ELSE 'O' END);
  RETURN COALESCE(NEW, OLD);
END $$ LANGUAGE plpgsql;

CREATE TRIGGER user_account_graft AFTER INSERT OR UPDATE OR DELETE
  ON user_account FOR EACH ROW EXECUTE FUNCTION graft_capture();
CREATE TRIGGER todo_graft AFTER INSERT OR UPDATE OR DELETE
  ON todo FOR EACH ROW EXECUTE FUNCTION graft_capture();
