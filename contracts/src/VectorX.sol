// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

import {IVectorX} from "./interfaces/IVectorX.sol";
import {IProofGateway} from "./interfaces/IProofGateway.sol";

/// @title VectorX — Avail→Ethereum data-attestation light client
/// @notice Stores GRANDPA-finalized Avail header-range commitments and
///         authority-set rotations, each backed by a proof verified through
///         the configured gateway.
///
/// Storage layout, event shapes, request ABIs and the range-commitment key
/// are parity-matched with the reference bridge contract
/// (/root/reference/contracts/src/VectorX.sol) so downstream consumers
/// (e.g. the events indexer, vectorx_tpu/services/events.py) work unchanged:
///
///  - header_range request input  (80 B, abi.encodePacked):
///      uint32 trustedBlock | bytes32 trustedHeaderHash |
///      uint64 authoritySetId | bytes32 authoritySetHash | uint32 targetBlock
///  - header_range verified output (96 B):
///      bytes32 targetHeaderHash | bytes32 stateRootCommitment |
///      bytes32 dataRootCommitment
///  - rotate request input (40 B): uint64 authoritySetId | bytes32 hash
///  - rotate verified output (32 B): bytes32 newAuthoritySetHash
///  - range mappings keyed by keccak256(abi.encode(startBlock, endBlock))
///
/// Upgradeability deviation: the reference deploys behind an ERC1967 proxy
/// with a timelocked guardian; this implementation is a plain contract with
/// a guardian role (proxy wiring is a deployment concern, orthogonal to the
/// light-client logic — wrap in any standard proxy if upgradability is
/// required).
contract VectorX is IVectorX {
    /// @notice Verification is frozen; only guardian data patches work.
    bool public frozen;

    /// @notice Proof gateway used for request/verify round trips.
    address public gateway;

    /// @notice Guardian with administrative rights.
    address public guardian;

    /// @notice Latest proven Avail block height.
    uint32 public latestBlock;

    /// @notice Latest known authority set id.
    uint64 public latestAuthoritySetId;

    /// @notice Registered verifier function id for header_range proofs.
    bytes32 public headerRangeFunctionId;

    /// @notice Registered verifier function id for rotate proofs.
    bytes32 public rotateFunctionId;

    /// @notice Merkle tree size (leaf count) of stored range commitments.
    uint32 public headerRangeCommitmentTreeSize;

    mapping(uint32 => bytes32) public blockHeightToHeaderHash;
    mapping(uint64 => bytes32) public authoritySetIdToHash;
    mapping(bytes32 => bytes32) public dataRootCommitments;
    mapping(bytes32 => bytes32) public stateRootCommitments;
    mapping(bytes32 => uint32) public rangeStartBlocks;

    /// @notice Gas forwarded to the gateway callback when fulfilling
    ///         asynchronous requests (same budget as the reference,
    ///         VectorX.sol:207,324).
    uint32 public constant CALLBACK_GAS_LIMIT = 500_000;

    error NotGuardian();

    struct InitParameters {
        address guardian;
        address gateway;
        uint32 height;
        bytes32 header;
        uint64 authoritySetId;
        bytes32 authoritySetHash;
        bytes32 headerRangeFunctionId;
        bytes32 rotateFunctionId;
        uint32 headerRangeCommitmentTreeSize;
    }

    modifier onlyGuardian() {
        if (msg.sender != guardian) revert NotGuardian();
        _;
    }

    constructor(InitParameters memory p) {
        guardian = p.guardian;
        gateway = p.gateway;
        frozen = false;
        latestBlock = p.height;
        latestAuthoritySetId = p.authoritySetId;
        blockHeightToHeaderHash[p.height] = p.header;
        authoritySetIdToHash[p.authoritySetId] = p.authoritySetHash;
        headerRangeFunctionId = p.headerRangeFunctionId;
        rotateFunctionId = p.rotateFunctionId;
        headerRangeCommitmentTreeSize = p.headerRangeCommitmentTreeSize;
    }

    function VERSION() external pure returns (string memory) {
        return "1.0.0-tpu";
    }

    // ------------------------------------------------------------------
    // Guardian operations
    // ------------------------------------------------------------------

    function updateFreeze(bool _freeze) external onlyGuardian {
        frozen = _freeze;
    }

    function updateGateway(address _gateway) external onlyGuardian {
        gateway = _gateway;
    }

    function updateGuardian(address _guardian) external onlyGuardian {
        guardian = _guardian;
    }

    function updateFunctionIds(
        bytes32 _headerRangeFunctionId,
        bytes32 _rotateFunctionId,
        uint32 _headerRangeCommitmentTreeSize
    ) external onlyGuardian {
        headerRangeFunctionId = _headerRangeFunctionId;
        rotateFunctionId = _rotateFunctionId;
        headerRangeCommitmentTreeSize = _headerRangeCommitmentTreeSize;
    }

    /// @notice Reset the trusted head (escape hatch after a chain incident).
    function updateGenesisState(
        uint32 _height,
        bytes32 _header,
        uint64 _authoritySetId,
        bytes32 _authoritySetHash
    ) external onlyGuardian {
        latestBlock = _height;
        blockHeightToHeaderHash[_height] = _header;
        latestAuthoritySetId = _authoritySetId;
        authoritySetIdToHash[_authoritySetId] = _authoritySetHash;
    }

    /// @notice Backfill range commitments computed off-chain (guardian tool
    ///         vectorx_tpu/services/operator.py fill_block_range mirrors the
    ///         reference's bin/fill_block_range.rs).
    function updateBlockRangeData(
        uint32[] calldata startBlocks,
        uint32[] calldata endBlocks,
        bytes32[] calldata headerHashes,
        bytes32[] calldata dataRootCommitments_,
        bytes32[] calldata stateRootCommitments_,
        uint64 endAuthoritySetId,
        bytes32 endAuthoritySetHash
    ) external onlyGuardian {
        require(
            startBlocks.length == endBlocks.length &&
                startBlocks.length == headerHashes.length &&
                startBlocks.length == dataRootCommitments_.length &&
                startBlocks.length == stateRootCommitments_.length,
            "length mismatch"
        );
        require(startBlocks.length > 0, "empty");
        require(startBlocks[0] == latestBlock, "first range must extend head");

        for (uint256 i = 0; i < startBlocks.length; i++) {
            if (i < startBlocks.length - 1) {
                require(endBlocks[i] == startBlocks[i + 1], "ranges not contiguous");
            }
            bytes32 key = keccak256(abi.encode(startBlocks[i], endBlocks[i]));
            dataRootCommitments[key] = dataRootCommitments_[i];
            stateRootCommitments[key] = stateRootCommitments_[i];
            rangeStartBlocks[key] = startBlocks[i];
            blockHeightToHeaderHash[endBlocks[i]] = headerHashes[i];
            emit HeaderRangeCommitmentStored(
                startBlocks[i],
                endBlocks[i],
                dataRootCommitments_[i],
                stateRootCommitments_[i],
                headerRangeCommitmentTreeSize
            );
        }

        uint32 newHead = endBlocks[endBlocks.length - 1];
        latestBlock = newHead;
        emit HeadUpdate(newHead, headerHashes[headerHashes.length - 1]);

        latestAuthoritySetId = endAuthoritySetId;
        authoritySetIdToHash[endAuthoritySetId] = endAuthoritySetHash;
        emit AuthoritySetStored(endAuthoritySetId, endAuthoritySetHash);
    }

    // ------------------------------------------------------------------
    // header_range: prove (trustedBlock, targetBlock] and commit roots
    // ------------------------------------------------------------------

    function _headerRangeInput(
        uint32 trustedBlock,
        bytes32 trustedHeader,
        uint64 authoritySetId,
        bytes32 authoritySetHash,
        uint32 targetBlock
    ) internal pure returns (bytes memory) {
        // 80-byte packed layout: circuits.abi.HeaderRangeInput.encode
        return abi.encodePacked(
            trustedBlock, trustedHeader, authoritySetId, authoritySetHash, targetBlock
        );
    }

    /// @notice Ask the gateway for a header-range proof up to `_targetBlock`
    ///         against the current trusted head and `_authoritySetId`.
    function requestHeaderRange(uint64 _authoritySetId, uint32 _targetBlock)
        external
        payable
    {
        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert TrustedHeaderNotFound();
        bytes32 authoritySetHash = authoritySetIdToHash[_authoritySetId];
        if (authoritySetHash == bytes32(0)) revert AuthoritySetNotFound();
        if (_authoritySetId < latestAuthoritySetId) revert OldAuthoritySetId();

        require(_targetBlock > latestBlock, "target not ahead of head");

        IProofGateway(gateway).requestCall{value: msg.value}(
            headerRangeFunctionId,
            _headerRangeInput(
                latestBlock, trustedHeader, _authoritySetId, authoritySetHash, _targetBlock
            ),
            address(this),
            abi.encodeWithSelector(
                this.commitHeaderRange.selector, _authoritySetId, _targetBlock
            ),
            CALLBACK_GAS_LIMIT
        );
        emit HeaderRangeRequested(
            latestBlock, trustedHeader, _authoritySetId, authoritySetHash, _targetBlock
        );
    }

    /// @notice Consume a verified header-range proof and store the range's
    ///         state/data root commitments, advancing the head.
    function commitHeaderRange(uint64 _authoritySetId, uint32 _targetBlock) external {
        if (frozen) revert ContractFrozen();

        bytes32 trustedHeader = blockHeightToHeaderHash[latestBlock];
        if (trustedHeader == bytes32(0)) revert TrustedHeaderNotFound();
        bytes32 authoritySetHash = authoritySetIdToHash[_authoritySetId];
        if (authoritySetHash == bytes32(0)) revert AuthoritySetNotFound();
        if (_authoritySetId < latestAuthoritySetId) revert OldAuthoritySetId();

        require(_targetBlock > latestBlock, "target not ahead of head");

        bytes memory output = IProofGateway(gateway).verifiedCall(
            headerRangeFunctionId,
            _headerRangeInput(
                latestBlock, trustedHeader, _authoritySetId, authoritySetHash, _targetBlock
            )
        );
        require(output.length == 96, "bad output length");

        // 96-byte layout: circuits.abi.HeaderRangeOutput
        (bytes32 targetHeaderHash, bytes32 stateRootCommitment, bytes32 dataRootCommitment)
        = abi.decode(output, (bytes32, bytes32, bytes32));

        blockHeightToHeaderHash[_targetBlock] = targetHeaderHash;

        bytes32 key = keccak256(abi.encode(latestBlock, _targetBlock));
        dataRootCommitments[key] = dataRootCommitment;
        stateRootCommitments[key] = stateRootCommitment;
        rangeStartBlocks[key] = latestBlock;

        emit HeaderRangeCommitmentStored(
            latestBlock,
            _targetBlock,
            dataRootCommitment,
            stateRootCommitment,
            headerRangeCommitmentTreeSize
        );
        emit HeadUpdate(_targetBlock, targetHeaderHash);

        latestBlock = _targetBlock;
        if (_authoritySetId > latestAuthoritySetId) {
            latestAuthoritySetId = _authoritySetId;
        }
    }

    // ------------------------------------------------------------------
    // rotate: prove authority set id -> id+1 hand-off
    // ------------------------------------------------------------------

    /// @notice Ask the gateway for a rotate proof from `_currentAuthoritySetId`
    ///         to the next set.
    function requestRotate(uint64 _currentAuthoritySetId) external payable {
        bytes32 currentHash = authoritySetIdToHash[_currentAuthoritySetId];
        if (currentHash == bytes32(0)) revert AuthoritySetNotFound();
        if (_currentAuthoritySetId < latestAuthoritySetId) revert OldAuthoritySetId();
        if (authoritySetIdToHash[_currentAuthoritySetId + 1] != bytes32(0)) {
            revert NextAuthoritySetExists();
        }

        IProofGateway(gateway).requestCall{value: msg.value}(
            rotateFunctionId,
            abi.encodePacked(_currentAuthoritySetId, currentHash),
            address(this),
            abi.encodeWithSelector(this.rotate.selector, _currentAuthoritySetId),
            CALLBACK_GAS_LIMIT
        );
        emit RotateRequested(_currentAuthoritySetId, currentHash);
    }

    /// @notice Consume a verified rotate proof, storing the next set's hash.
    function rotate(uint64 _currentAuthoritySetId) external {
        if (frozen) revert ContractFrozen();

        bytes32 currentHash = authoritySetIdToHash[_currentAuthoritySetId];
        if (currentHash == bytes32(0)) revert AuthoritySetNotFound();
        if (authoritySetIdToHash[_currentAuthoritySetId + 1] != bytes32(0)) {
            revert NextAuthoritySetExists();
        }

        bytes memory output = IProofGateway(gateway).verifiedCall(
            rotateFunctionId, abi.encodePacked(_currentAuthoritySetId, currentHash)
        );
        require(output.length == 32, "bad output length");
        bytes32 newAuthoritySetHash = abi.decode(output, (bytes32));

        uint64 nextId = _currentAuthoritySetId + 1;
        authoritySetIdToHash[nextId] = newAuthoritySetHash;
        emit AuthoritySetStored(nextId, newAuthoritySetHash);
    }
}
