/*
 * Minimal in-memory DataSource V2 catalog WITH row-level operation
 * support in BOTH rewrite modes Spark knows, so `MERGE INTO` (and
 * UPDATE/DELETE) can be EXECUTED through Spark in a sandbox that has no
 * Delta/Iceberg connector jar:
 *
 * - group-based (copy-on-write, ReplaceData): the default. The scan
 *   group is the whole table; commit REPLACES the table contents with
 *   the rewritten rows -- Delta Lake's and Iceberg CoW's model.
 * - delta-based (merge-on-read, WriteDelta): opt-in per table with
 *   TBLPROPERTIES('rewrite'='delta','rowid'='<col>[,<col>...]').
 *   The operation implements SupportsDelta; the writer receives per-row
 *   DELETE/UPDATE/INSERT ops keyed by the declared row-id columns and
 *   commit applies them surgically -- Iceberg MoR's model (VERDICT r5
 *   next #3: validate the emitted MERGE under both rewrite paths).
 *
 * Purpose-built test scaffolding for tests/test_merge_into.py: the
 * cruncher_spark merge_into emitter renders PointTable policy specs as
 * MERGE statements (the lakehouse analog of the reference's
 * `INSERT .. ON DUPLICATE KEY UPDATE`, crunch_global.sql:68-87), and this
 * catalog lets the emitted SQL run for real instead of being
 * string-compared.
 *
 * Design notes (kept deliberately tiny; LOCAL MODE ONLY):
 * - Storage is a static map of row lists keyed by table identity; reader
 *   and writer tasks reach it directly because local[*] shares one JVM.
 * - Plain INSERT INTO appends; truncate supported for test setup.
 */

import java.util.ArrayList;
import java.util.Arrays;
import java.util.Collections;
import java.util.EnumSet;
import java.util.Iterator;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.DeltaBatchWrite;
import org.apache.spark.sql.connector.write.DeltaWrite;
import org.apache.spark.sql.connector.write.DeltaWriteBuilder;
import org.apache.spark.sql.connector.write.DeltaWriter;
import org.apache.spark.sql.connector.write.DeltaWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsDelta;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

public class MemoryRowLevelCatalog implements TableCatalog, SupportsNamespaces {

    static final Map<String, MemTable> TABLES = new ConcurrentHashMap<>();
    static final Set<String> NAMESPACES = ConcurrentHashMap.newKeySet();

    private String catalogName = "memcat";

    private static String key(String catalog, Identifier ident) {
        return catalog + "\0" + String.join(".", ident.namespace())
                + "\0" + ident.name();
    }

    @Override
    public void initialize(String name, CaseInsensitiveStringMap options) {
        this.catalogName = name;
    }

    @Override
    public String name() {
        return catalogName;
    }

    // -- tables --------------------------------------------------------------

    @Override
    public Identifier[] listTables(String[] namespace) {
        List<Identifier> out = new ArrayList<>();
        for (MemTable t : TABLES.values()) {
            if (t.catalog.equals(catalogName)
                    && Arrays.equals(t.ident.namespace(), namespace)) {
                out.add(t.ident);
            }
        }
        return out.toArray(new Identifier[0]);
    }

    @Override
    public Table loadTable(Identifier ident)
            throws org.apache.spark.sql.catalyst.analysis.NoSuchTableException {
        MemTable t = TABLES.get(key(catalogName, ident));
        if (t == null) {
            throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident);
        }
        return t;
    }

    @Override
    @SuppressWarnings("deprecation")
    public Table createTable(Identifier ident, StructType schema,
                             Transform[] partitions, Map<String, String> properties) {
        boolean delta = "delta".equalsIgnoreCase(
                properties.getOrDefault("rewrite", "group"));
        String rowid = properties.getOrDefault(
                "rowid", schema.fields()[0].name());
        MemTable t = new MemTable(catalogName, ident, schema, delta,
                rowid.split("\\s*,\\s*"));
        TABLES.put(key(catalogName, ident), t);
        return t;
    }

    @Override
    public Table alterTable(Identifier ident, TableChange... changes) {
        throw new UnsupportedOperationException("alterTable");
    }

    @Override
    public boolean dropTable(Identifier ident) {
        return TABLES.remove(key(catalogName, ident)) != null;
    }

    @Override
    public void renameTable(Identifier oldIdent, Identifier newIdent) {
        throw new UnsupportedOperationException("renameTable");
    }

    // -- namespaces (permissive: every referenced namespace exists) ----------

    @Override
    public String[][] listNamespaces() {
        return NAMESPACES.stream().map(n -> n.split("\\."))
                .toArray(String[][]::new);
    }

    @Override
    public String[][] listNamespaces(String[] namespace) {
        return new String[0][];
    }

    @Override
    public boolean namespaceExists(String[] namespace) {
        return true;
    }

    @Override
    public Map<String, String> loadNamespaceMetadata(String[] namespace) {
        return Collections.emptyMap();
    }

    @Override
    public void createNamespace(String[] namespace, Map<String, String> metadata) {
        NAMESPACES.add(String.join(".", namespace));
    }

    @Override
    public void alterNamespace(String[] namespace, NamespaceChange... changes) {
        throw new UnsupportedOperationException("alterNamespace");
    }

    @Override
    public boolean dropNamespace(String[] namespace, boolean cascade) {
        return NAMESPACES.remove(String.join(".", namespace));
    }

    // -- the table -----------------------------------------------------------

    static class MemTable implements Table, SupportsRead, SupportsWrite,
            SupportsRowLevelOperations {
        final String catalog;
        final Identifier ident;
        final StructType tableSchema;
        final boolean deltaRewrite;
        final String[] rowIdCols;
        final List<InternalRow> rows =
                Collections.synchronizedList(new ArrayList<>());

        MemTable(String catalog, Identifier ident, StructType schema,
                 boolean deltaRewrite, String[] rowIdCols) {
            this.catalog = catalog;
            this.ident = ident;
            this.tableSchema = schema;
            this.deltaRewrite = deltaRewrite;
            this.rowIdCols = rowIdCols;
        }

        String storeKey() {
            return key(catalog, ident);
        }

        @Override
        public String name() {
            return ident.toString();
        }

        @Override
        @SuppressWarnings("deprecation")
        public StructType schema() {
            return tableSchema;
        }

        @Override
        public Set<TableCapability> capabilities() {
            return EnumSet.of(TableCapability.BATCH_READ,
                    TableCapability.BATCH_WRITE, TableCapability.TRUNCATE);
        }

        @Override
        public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
            return () -> new MemScan(storeKey(), tableSchema);
        }

        @Override
        public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
            return new MemWriteBuilder(storeKey(), false, tableSchema,
                    info.schema());
        }

        @Override
        public RowLevelOperationBuilder newRowLevelOperationBuilder(
                RowLevelOperationInfo info) {
            if (deltaRewrite) {
                return () -> new MemDeltaOperation(this, info.command());
            }
            return () -> new MemRowLevelOperation(this, info.command());
        }
    }

    static class MemRowLevelOperation implements RowLevelOperation {
        final MemTable table;
        final Command cmd;

        MemRowLevelOperation(MemTable table, Command cmd) {
            this.table = table;
            this.cmd = cmd;
        }

        @Override
        public Command command() {
            return cmd;
        }

        @Override
        public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
            return () -> new MemScan(table.storeKey(), table.tableSchema);
        }

        @Override
        public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
            // group-based rewrite: the scan read the whole table, so the
            // write must REPLACE the whole table with the rewritten rows.
            // The rewrite's write schema may carry extra plan columns
            // (e.g. the operation's row-tracking column) in a different
            // order -- the writer projects by NAME onto the table schema.
            return new MemWriteBuilder(table.storeKey(), true,
                    table.tableSchema, info.schema());
        }

        @Override
        public String description() {
            return "memory-" + cmd;
        }
    }

    // -- delta-based (merge-on-read) row-level operation ----------------------

    static class MemDeltaOperation implements SupportsDelta {
        final MemTable table;
        final Command cmd;

        MemDeltaOperation(MemTable table, Command cmd) {
            this.table = table;
            this.cmd = cmd;
        }

        @Override
        public Command command() {
            return cmd;
        }

        @Override
        public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
            return () -> new MemScan(table.storeKey(), table.tableSchema);
        }

        @Override
        public NamedReference[] rowId() {
            NamedReference[] refs = new NamedReference[table.rowIdCols.length];
            for (int i = 0; i < refs.length; i++) {
                refs[i] = Expressions.column(table.rowIdCols[i]);
            }
            return refs;
        }

        @Override
        public DeltaWriteBuilder newWriteBuilder(LogicalWriteInfo info) {
            return new DeltaWriteBuilder() {
                @Override
                public DeltaWrite build() {
                    return new DeltaWrite() {
                        @Override
                        public DeltaBatchWrite toBatch() {
                            return new MemDeltaBatchWrite(table, info.schema());
                        }
                    };
                }
            };
        }

        @Override
        public String description() {
            return "memory-delta-" + cmd;
        }
    }

    static class MemDeltaBatchWrite implements DeltaBatchWrite {
        final String storeKey;
        final StructType tableSchema;
        final StructType writeSchema;
        final String[] rowIdCols;

        MemDeltaBatchWrite(MemTable table, StructType writeSchema) {
            this.storeKey = table.storeKey();
            this.tableSchema = table.tableSchema;
            this.writeSchema = writeSchema;
            this.rowIdCols = table.rowIdCols;
        }

        private int[] rowIdIdx() {
            int[] idx = new int[rowIdCols.length];
            for (int i = 0; i < rowIdCols.length; i++) {
                idx[i] = tableSchema.fieldIndex(rowIdCols[i]);
            }
            return idx;
        }

        @Override
        public DeltaWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
            int[] srcIdx = new int[tableSchema.length()];
            for (int i = 0; i < tableSchema.length(); i++) {
                srcIdx[i] = writeSchema.fieldIndex(tableSchema.fields()[i].name());
            }
            org.apache.spark.sql.types.DataType[] idTypes =
                    new org.apache.spark.sql.types.DataType[rowIdCols.length];
            int[] idIdx = rowIdIdx();
            for (int i = 0; i < rowIdCols.length; i++) {
                idTypes[i] = tableSchema.fields()[idIdx[i]].dataType();
            }
            return new MemDeltaWriterFactory(tableSchema, srcIdx,
                    writeSchema.length(), idTypes);
        }

        /** Key values normalized for cross-representation equality. */
        static List<Object> normKey(Object[] vals) {
            List<Object> out = new ArrayList<>(vals.length);
            for (Object v : vals) {
                if (v instanceof org.apache.spark.unsafe.types.UTF8String) {
                    v = v.toString();
                }
                out.add(v);
            }
            return out;
        }

        @Override
        public void commit(WriterCommitMessage[] messages) {
            MemTable t = TABLES.get(storeKey);
            int[] idIdx = rowIdIdx();
            org.apache.spark.sql.types.DataType[] idTypes =
                    new org.apache.spark.sql.types.DataType[idIdx.length];
            for (int i = 0; i < idIdx.length; i++) {
                idTypes[i] = tableSchema.fields()[idIdx[i]].dataType();
            }
            Set<List<Object>> removed = ConcurrentHashMap.newKeySet();
            List<InternalRow> additions = new ArrayList<>();
            for (WriterCommitMessage m : messages) {
                MemDeltaCommitMessage dm = (MemDeltaCommitMessage) m;
                removed.addAll(dm.removedKeys);
                additions.addAll(dm.rows);
            }
            synchronized (t.rows) {
                t.rows.removeIf(row -> {
                    Object[] key = new Object[idIdx.length];
                    for (int i = 0; i < idIdx.length; i++) {
                        key[i] = row.isNullAt(idIdx[i]) ? null
                                : row.get(idIdx[i], idTypes[i]);
                    }
                    return removed.contains(normKey(key));
                });
                t.rows.addAll(additions);
            }
        }

        @Override
        public void abort(WriterCommitMessage[] messages) {
        }
    }

    static class MemDeltaWriterFactory implements DeltaWriterFactory {
        final StructType tableSchema;
        final int[] srcIdx;
        final int writeSchemaLen;
        final org.apache.spark.sql.types.DataType[] idTypes;

        MemDeltaWriterFactory(StructType tableSchema, int[] srcIdx,
                              int writeSchemaLen,
                              org.apache.spark.sql.types.DataType[] idTypes) {
            this.tableSchema = tableSchema;
            this.srcIdx = srcIdx;
            this.writeSchemaLen = writeSchemaLen;
            this.idTypes = idTypes;
        }

        @Override
        public DeltaWriter<InternalRow> createWriter(int partitionId, long taskId) {
            List<List<Object>> removedKeys = new ArrayList<>();
            List<InternalRow> rows = new ArrayList<>();
            return new DeltaWriter<InternalRow>() {
                private List<Object> keyOf(InternalRow id) {
                    Object[] vals = new Object[idTypes.length];
                    for (int i = 0; i < idTypes.length; i++) {
                        vals[i] = id.isNullAt(i) ? null : id.get(i, idTypes[i]);
                    }
                    return MemDeltaBatchWrite.normKey(vals);
                }

                private InternalRow projected(InternalRow record) {
                    // same defensive undeclared-leading-columns handling
                    // as the group-based writer
                    int extra = record.numFields() - writeSchemaLen;
                    if (extra < 0) {
                        throw new IllegalStateException(
                                "delta write row has " + record.numFields()
                                + " fields, write schema declared "
                                + writeSchemaLen);
                    }
                    Object[] values = new Object[srcIdx.length];
                    for (int i = 0; i < srcIdx.length; i++) {
                        int j = srcIdx[i] + extra;
                        Object v = record.isNullAt(j) ? null
                                : record.get(j,
                                        tableSchema.fields()[i].dataType());
                        if (v instanceof org.apache.spark.unsafe.types.UTF8String) {
                            v = ((org.apache.spark.unsafe.types.UTF8String) v).clone();
                        }
                        values[i] = v;
                    }
                    return new org.apache.spark.sql.catalyst.expressions
                            .GenericInternalRow(values);
                }

                @Override
                public void delete(InternalRow metadata, InternalRow id) {
                    removedKeys.add(keyOf(id));
                }

                @Override
                public void update(InternalRow metadata, InternalRow id,
                                   InternalRow row) {
                    removedKeys.add(keyOf(id));
                    rows.add(projected(row));
                }

                @Override
                public void insert(InternalRow row) {
                    rows.add(projected(row));
                }

                @Override
                public WriterCommitMessage commit() {
                    return new MemDeltaCommitMessage(
                            new ArrayList<>(removedKeys), new ArrayList<>(rows));
                }

                @Override
                public void abort() {
                }

                @Override
                public void close() {
                }
            };
        }
    }

    static class MemDeltaCommitMessage implements WriterCommitMessage {
        final List<List<Object>> removedKeys;
        final List<InternalRow> rows;

        MemDeltaCommitMessage(List<List<Object>> removedKeys,
                              List<InternalRow> rows) {
            this.removedKeys = removedKeys;
            this.rows = rows;
        }
    }

    // -- read path ------------------------------------------------------------

    static class MemScan implements Scan, Batch {
        final String storeKey;
        final StructType schema;

        MemScan(String storeKey, StructType schema) {
            this.storeKey = storeKey;
            this.schema = schema;
        }

        @Override
        public StructType readSchema() {
            return schema;
        }

        @Override
        public Batch toBatch() {
            return this;
        }

        @Override
        public InputPartition[] planInputPartitions() {
            return new InputPartition[]{new MemPartition(storeKey)};
        }

        @Override
        public PartitionReaderFactory createReaderFactory() {
            return new MemReaderFactory();
        }

        @Override
        public String description() {
            return "memory-scan " + storeKey;
        }
    }

    static class MemPartition implements InputPartition {
        final String storeKey;

        MemPartition(String storeKey) {
            this.storeKey = storeKey;
        }
    }

    static class MemReaderFactory implements PartitionReaderFactory {
        @Override
        public PartitionReader<InternalRow> createReader(InputPartition partition) {
            String storeKey = ((MemPartition) partition).storeKey;
            MemTable t = TABLES.get(storeKey);
            // local-mode contract: executor threads share the driver JVM
            List<InternalRow> snapshot =
                    t == null ? List.of() : new ArrayList<>(t.rows);
            Iterator<InternalRow> it = snapshot.iterator();
            return new PartitionReader<InternalRow>() {
                InternalRow current;

                @Override
                public boolean next() {
                    if (!it.hasNext()) {
                        return false;
                    }
                    current = it.next();
                    return true;
                }

                @Override
                public InternalRow get() {
                    return current;
                }

                @Override
                public void close() {
                }
            };
        }
    }

    // -- write path -----------------------------------------------------------

    static class MemWriteBuilder implements WriteBuilder, SupportsTruncate {
        final String storeKey;
        boolean replace;
        final StructType tableSchema;
        final StructType writeSchema;

        MemWriteBuilder(String storeKey, boolean replace,
                        StructType tableSchema, StructType writeSchema) {
            this.storeKey = storeKey;
            this.replace = replace;
            this.tableSchema = tableSchema;
            this.writeSchema = writeSchema;
        }

        @Override
        public WriteBuilder truncate() {
            this.replace = true;
            return this;
        }

        @Override
        public Write build() {
            return new Write() {
                @Override
                public BatchWrite toBatch() {
                    return new MemBatchWrite(storeKey, replace, tableSchema,
                            writeSchema);
                }
            };
        }
    }

    static class MemBatchWrite implements BatchWrite {
        final String storeKey;
        final boolean replace;
        final StructType tableSchema;
        final StructType writeSchema;

        MemBatchWrite(String storeKey, boolean replace,
                      StructType tableSchema, StructType writeSchema) {
            this.storeKey = storeKey;
            this.replace = replace;
            this.tableSchema = tableSchema;
            this.writeSchema = writeSchema;
        }

        @Override
        public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
            // project incoming rows onto the TABLE schema by field name:
            // the row-level rewrite writes (tableSchema ++ plan columns)
            // in plan order, a plain INSERT writes tableSchema verbatim
            int[] srcIdx = new int[tableSchema.length()];
            for (int i = 0; i < tableSchema.length(); i++) {
                srcIdx[i] = writeSchema.fieldIndex(tableSchema.fields()[i].name());
            }
            return new MemWriterFactory(tableSchema, srcIdx, writeSchema.length());
        }

        @Override
        public void commit(WriterCommitMessage[] messages) {
            List<InternalRow> fresh = new ArrayList<>();
            for (WriterCommitMessage m : messages) {
                fresh.addAll(((MemCommitMessage) m).rows);
            }
            MemTable t = TABLES.get(storeKey);
            synchronized (t.rows) {
                if (replace) {
                    t.rows.clear();
                }
                t.rows.addAll(fresh);
            }
        }

        @Override
        public void abort(WriterCommitMessage[] messages) {
        }
    }

    static class MemWriterFactory implements DataWriterFactory {
        final StructType tableSchema;
        final int[] srcIdx;
        final int writeSchemaLen;

        MemWriterFactory(StructType tableSchema, int[] srcIdx, int writeSchemaLen) {
            this.tableSchema = tableSchema;
            this.srcIdx = srcIdx;
            this.writeSchemaLen = writeSchemaLen;
        }

        @Override
        public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
            List<InternalRow> buf = new ArrayList<>();
            return new DataWriter<InternalRow>() {
                @Override
                public void write(InternalRow record) {
                    // Spark 4.1's group-based MERGE rewrite (MergeRows /
                    // ReplaceData) physically prepends its internal
                    // cardinality-check ROW_ID column WITHOUT declaring it
                    // in LogicalWriteInfo.schema(); plain INSERT rows match
                    // the declared schema exactly. Skip the undeclared
                    // leading plan columns.
                    int extra = record.numFields() - writeSchemaLen;
                    if (extra < 0) {
                        throw new IllegalStateException(
                                "write row has " + record.numFields()
                                + " fields, write schema declared "
                                + writeSchemaLen);
                    }
                    Object[] values = new Object[srcIdx.length];
                    for (int i = 0; i < srcIdx.length; i++) {
                        int j = srcIdx[i] + extra;
                        Object v = record.isNullAt(j) ? null
                                : record.get(j,
                                        tableSchema.fields()[i].dataType());
                        if (v instanceof org.apache.spark.unsafe.types.UTF8String) {
                            v = ((org.apache.spark.unsafe.types.UTF8String) v).clone();
                        }
                        values[i] = v;
                    }
                    buf.add(new org.apache.spark.sql.catalyst.expressions
                            .GenericInternalRow(values));
                }

                @Override
                public WriterCommitMessage commit() {
                    return new MemCommitMessage(new ArrayList<>(buf));
                }

                @Override
                public void abort() {
                }

                @Override
                public void close() {
                }
            };
        }
    }

    static class MemCommitMessage implements WriterCommitMessage {
        // InternalRow copies are UnsafeRow/GenericInternalRow -- both
        // java-serializable; in local mode this never actually crosses a wire
        final List<InternalRow> rows;

        MemCommitMessage(List<InternalRow> rows) {
            this.rows = rows;
        }
    }
}
